from gaussianavatar_tpu.ops.rotations import (
    axis_angle_to_matrix,
    matrix_to_axis_angle,
    euler_angles_to_matrix,
    quaternion_to_matrix,
)
from gaussianavatar_tpu.ops.camera import (
    world_to_view,
    projection_from_intrinsics,
    projection_from_fov,
    fov2focal,
    focal2fov,
    Camera,
)
from gaussianavatar_tpu.ops.lbs import lbs, blend_shapes, vertices2joints, batch_rigid_transform
from gaussianavatar_tpu.ops.ssim import ssim
from gaussianavatar_tpu.ops.rasterize import rasterize, RasterizeConfig
