"""sp_coupler_tpu — TPU-native superparameterized atmosphere framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
CloudResolvingClimateModeling/sp-coupler (reference: /root/reference): a global
spectral-transform GCM (OpenIFS stand-in) coupled two-way to a fleet of
embedded anelastic LES instances (DALES stand-in), with the spcpl-style
per-column forcing/tendency exchange implemented as batched vmapped
transforms instead of per-instance RPC.

Architecture: one SPMD program. The GCM, every LES instance, and the coupler
are arrays and jitted transforms on a single device mesh; instance parallelism
is a leading batch axis sharded over chips, intra-instance parallelism is
spatial sharding with ICI halo exchange, and the spectral transforms ride the
MXU as einsums.
"""

__version__ = "0.1.0"

from . import constants  # noqa: F401
