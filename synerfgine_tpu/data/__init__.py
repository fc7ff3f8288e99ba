from .nerf_loader import NerfDataset, load_nerf_dataset
