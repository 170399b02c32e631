"""Data: toy generators, image datasets, loaders, native engine."""

from laplace_inducing_points_tpu.data.loader import (ArrayDataset, DataLoader,
                                                     cycling_batches,
                                                     device_iter,
                                                     make_dataloaders)
