from .renderer import RendererOutputInfo, RendererOutputType
from .tile_renderer import TileRendererConfig, TileRenderer, RenderOutputs
