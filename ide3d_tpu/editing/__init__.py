from .latent_editor import (
    compute_ganspace_pca,
    apply_ganspace_edit,
    apply_interfacegan,
    LevelsMapper,
)
