from .models import (  # noqa: F401
    CameraModelType,
    NUM_PARAMS,
    MAX_INTRINSICS,
    FOCAL, ASPECT, SKEW, PP_X, PP_Y,
    default_intrinsics,
    distort,
    undistort,
    pixel_from_camera_point,
    pixel_to_normalized_ray,
    project,
    project_batch,
    world_to_camera,
)
