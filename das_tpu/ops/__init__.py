from .deform_conv import dcn_v2, modulated_deform_conv
from .interp import (grid_sample, interpolate_bilinear_ac,
                     sample_bilinear_abs, upsample_nearest)
from .oks_nms import (default_sigmas, oks_nms_fixed, oks_nms_np,
                      soft_oks_nms_np)
from .preprocess import affine_warp, make_preprocess_fn, resize_bilinear

__all__ = [
    'dcn_v2', 'modulated_deform_conv', 'grid_sample',
    'interpolate_bilinear_ac', 'sample_bilinear_abs', 'upsample_nearest',
    'default_sigmas', 'oks_nms_fixed', 'oks_nms_np', 'soft_oks_nms_np',
    'affine_warp', 'make_preprocess_fn', 'resize_bilinear'
]
