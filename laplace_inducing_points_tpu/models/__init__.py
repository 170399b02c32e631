"""Models: toy + scale Flax zoo, TrainState, registry."""

from laplace_inducing_points_tpu.models.registry import get_model
from laplace_inducing_points_tpu.models.scale import (BasicBlock,
                                                      LargeClassifier, LeNet5,
                                                      ResNet1M)
from laplace_inducing_points_tpu.models.state import (EMPTY_STATS, TrainState,
                                                      create_train_state)
from laplace_inducing_points_tpu.models.toy import (SimpleClassifier,
                                                    SimpleRegressor)
