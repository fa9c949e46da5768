from .renderer import ViewerRenderer
from .viewer import Viewer
