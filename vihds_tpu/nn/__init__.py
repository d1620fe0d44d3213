"""Neural-network building blocks as explicit param pytrees + pure applies."""

from vihds_tpu.nn import layers  # noqa: F401
from vihds_tpu.nn.encoder import Encoder  # noqa: F401
