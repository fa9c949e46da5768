from .transforms import quat_to_rotmat, normalize_quat, build_cov3d
from .sh import sh_to_rgb, rgb_to_sh0, sh0_to_rgb, num_sh_bases
from .projection import project_gaussians, Projections
