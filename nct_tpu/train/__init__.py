"""Training stack: optimizers, LR policies, solver loop, checkpointing.

TPU-native counterpart of the vendored framework's training system
(reference: src/caffe/solver.cpp, src/caffe/solvers/*, parallel.cpp), which
ships with the reference even though the colour-transfer app never trains.
"""

from nct_tpu.train.lr_policies import learning_rate  # noqa: F401
from nct_tpu.train.optimizers import make_optimizer  # noqa: F401
from nct_tpu.train.solver import Solver, SolverParams  # noqa: F401
