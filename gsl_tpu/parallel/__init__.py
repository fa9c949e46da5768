from .gaussian_sharded import make_mp_train_step, make_mesh
