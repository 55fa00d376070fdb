from .camera import (
    normalize_vecs,
    sample_camera_origins,
    create_cam2world_matrix,
    look_at_pose,
    get_initial_rays,
    perturb_z_vals,
    transform_rays_to_world,
    FOCAL_LENGTH_FFHQ,
    INTRINSICS_FFHQ,
    CANONICAL_POSE_25,
    make_label_25,
)
from .integration import integrate_rays, sample_pdf
from .renderer import TriplaneRenderer, RenderParams
