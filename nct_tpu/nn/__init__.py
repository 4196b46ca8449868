"""Config-driven NN graph framework (the Caffe ``Net``/``Layer`` analogue).

TPU-native replacement for the vendored framework core (reference:
src/caffe/net.cpp Net<Dtype>, include/caffe/layer.hpp + layer registry,
src/caffe/layers/*): a prototxt-driven DAG of registered layer ops executed
as one jitted XLA program, with weights loaded straight from .caffemodel
files via the wire-format reader in nct_tpu.models.caffe_io.
"""

from nct_tpu.nn.layers import LAYER_REGISTRY, register_layer  # noqa: F401
from nct_tpu.nn import losses  # noqa: F401  (registers loss/data layers)
from nct_tpu.nn import recurrent  # noqa: F401  (registers RNN/LSTM)
from nct_tpu.nn import vision  # noqa: F401  (registers ROI/PSROI pooling)
from nct_tpu.nn.net import Net  # noqa: F401
from nct_tpu.nn.net_spec import L, NetSpec, emit_prototxt  # noqa: F401
from nct_tpu.nn.prototxt import parse_prototxt  # noqa: F401
