from se3ds_tpu.train import losses
from se3ds_tpu.train import state
