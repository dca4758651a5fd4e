from se3ds_tpu.models import discriminator
from se3ds_tpu.models import generator
from se3ds_tpu.models import layers
