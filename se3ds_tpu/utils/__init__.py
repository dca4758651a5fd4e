from se3ds_tpu.utils import image_grid
from se3ds_tpu.utils import logger
from se3ds_tpu.utils import math_utils
from se3ds_tpu.utils import parameter_overview
from se3ds_tpu.utils import task_manager
