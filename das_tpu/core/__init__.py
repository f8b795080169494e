from .decode import decode_batch, decode_single_image
from .targets import get_targets, make_points

__all__ = ['decode_batch', 'decode_single_image', 'get_targets',
           'make_points']
