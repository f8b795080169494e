# Runtime defaults (ref recipe: /root/reference/configs/_base_/default_runtime.py).
checkpoint_config = dict(interval=1)
log_config = dict(interval=50)
log_level = 'INFO'
work_dir = None
load_from = None
resume_from = None
# TPU runtime knobs (replace dist_params=dict(backend='nccl')):
mesh = dict(data=-1)         # -1: all local devices on the data axis
compute_dtype = 'bfloat16'   # MXU-native compute; params/loss stay fp32
