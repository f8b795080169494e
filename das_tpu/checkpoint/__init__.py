from .orbax_io import CheckpointManager
from .torch_bridge import (convert_state_dict, export_torch_state_dict,
                           load_mspn_pretrained, load_torch_checkpoint,
                           merge_into_variables, save_torch_checkpoint)

__all__ = ['CheckpointManager', 'convert_state_dict',
           'export_torch_state_dict', 'load_mspn_pretrained',
           'load_torch_checkpoint', 'merge_into_variables',
           'save_torch_checkpoint']
