from .checkpoint import save_checkpoint, load_checkpoint, save_pytree_npz, load_pytree_npz
