from se3ds_tpu.eval import fid
from se3ds_tpu.eval import metrics
