from .cameras import Cameras, make_camera
