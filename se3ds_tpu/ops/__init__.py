from se3ds_tpu.ops import geometry
from se3ds_tpu.ops import image
from se3ds_tpu.ops import splat
