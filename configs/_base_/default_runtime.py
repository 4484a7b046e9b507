checkpoint_config = dict(interval=1)
log_config = dict(interval=50)
seed = 0
resume_from = None
load_from = None
