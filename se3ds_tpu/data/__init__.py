from se3ds_tpu.data import datasets
from se3ds_tpu.data import example_pb
from se3ds_tpu.data import png
from se3ds_tpu.data import synthetic
from se3ds_tpu.data import tensorproto
from se3ds_tpu.data import tfrecord
