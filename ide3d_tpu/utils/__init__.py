from .seg import (
    COLOR_MAP,
    LABEL_LIST,
    BISENET_REMAP,
    mask2color,
    mask2onehot,
    onehot2mask,
    id_remap,
)
from .misc import assert_shape, EasyDict
