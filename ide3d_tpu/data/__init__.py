from .dataset import CameraLabeledDataset, ImageFolderDataset, infinite_loader
