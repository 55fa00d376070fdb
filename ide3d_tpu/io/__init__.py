from .checkpoint import save_checkpoint, load_checkpoint, save_pytree_npz, load_pytree_npz
from .export import export_generator, load_artifact
from .torch_import import (
    import_discriminator,
    import_encoder,
    import_generator,
    load_network_pkl,
    pickle_payload_to_state_dicts,
)
