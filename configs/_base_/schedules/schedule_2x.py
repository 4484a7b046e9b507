# 2x schedule (reference configs/_base_/schedules/schedule_2x.py):
# SGD lr 0.02, momentum 0.9, wd 1e-4; step decay at epochs [16, 22]; 24 ep.
optimizer = dict(type="sgd", lr=0.02, momentum=0.9, weight_decay=1e-4)
lr_config = dict(warmup_iters=500, warmup_factor=1.0 / 1000,
                 milestones=[16, 22], gamma=0.1)
runner = dict(type="EpochBasedRunner", max_epochs=24)
