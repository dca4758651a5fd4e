from se3ds_tpu.parallel import mesh
