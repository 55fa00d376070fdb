from .dataset import CameraLabeledDataset, ImageFolderDataset, infinite_loader
from .prefetch import PrefetchLoader
