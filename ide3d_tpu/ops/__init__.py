from .bias_act import activation_funcs, bias_act
from .upfirdn2d import (
    setup_filter,
    upfirdn2d,
    filter2d,
    upsample2d,
    downsample2d,
)
from .conv2d_resample import conv2d_resample
from .modulated_conv import modulated_conv2d
from .grid_sample import (
    grid_sample_2d,
    grid_sample_2d_quad,
    grid_sample_3d,
    sample_from_2dgrid,
    sample_from_3dgrid,
    sample_from_triplane,
)
from .filtered_lrelu import filtered_lrelu
