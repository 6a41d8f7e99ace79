from .resize import (
    resize_bilinear,
    resize_nearest,
    bilinear_resize_matrix,
    nearest_resize_matrix,
    central_crop_resize,
    crop_resize_matrices,
)
from .warp import dense_image_warp
from .cost_volume import cost_volume
from .losses import charbonnier_loss
from .metrics import (
    iou,
    boundary_score,
    disambiguate_forward_background,
    compute_all_iou,
    mae,
)
from .flow import standardize_flow, flow_to_image
