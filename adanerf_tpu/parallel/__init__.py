from .mesh import make_mesh, shard_train_step, batch_shardings
