from se3ds_tpu.inference import perturbation
