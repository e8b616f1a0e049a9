"""Shim: the torch parity oracle now lives in painter_tpu.utils.torch_oracle
(so the parity CLI tool can use it outside tests)."""
from painter_tpu.utils.torch_oracle import torch_forward  # noqa: F401
