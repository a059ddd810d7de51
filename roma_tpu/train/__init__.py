from roma_tpu.train.train import TrainState, make_train_step, make_tiny_train_state
