from .mesh import make_mesh, replicate, shard_batch
from .train_step import (TrainState, make_lr_fn, make_optimizer,
                         make_train_step, mspn_frozen_prefixes)

__all__ = ['make_mesh', 'replicate', 'shard_batch', 'TrainState',
           'make_lr_fn', 'make_optimizer', 'make_train_step',
           'mspn_frozen_prefixes']
