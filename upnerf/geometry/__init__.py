from . import procrustes, rays, se3
from .procrustes import (
    evaluate_camera_alignment,
    parse_raw_camera,
    prealign_cameras,
    procrustes_analysis,
    rotation_distance,
)
from .rays import get_ray_directions, get_rays, pixel_directions
from .se3 import (
    SE3_to_se3,
    SO3_to_so3,
    cam2world,
    compose,
    compose_pair,
    invert,
    make_pose,
    se3_to_SE3,
    skew_symmetric,
    so3_to_SO3,
    to_hom,
    world2cam,
)

__all__ = [
    "procrustes",
    "rays",
    "se3",
    "SE3_to_se3",
    "SO3_to_so3",
    "cam2world",
    "compose",
    "compose_pair",
    "evaluate_camera_alignment",
    "get_ray_directions",
    "get_rays",
    "invert",
    "make_pose",
    "parse_raw_camera",
    "pixel_directions",
    "prealign_cameras",
    "procrustes_analysis",
    "rotation_distance",
    "se3_to_SE3",
    "skew_symmetric",
    "so3_to_SO3",
    "to_hom",
    "world2cam",
]
