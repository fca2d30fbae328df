"""polarcode_and_ldpc_tpu — a TPU-native FEC simulation framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of the reference
pure-NumPy channel-coding laboratory (B1ear/PolarCode_and_LDPC):

* Polar codes: Kronecker-butterfly encoder, SC / SCL / CA-SCL decoders
  (reference: ``src/polar/``).
* LDPC codes: GF(2) systematic encoder, BP (sum-product) and Min-Sum
  (normalized + offset) decoders (reference: ``src/ldpc/``).
* Channels: AWGN / BSC / Rayleigh with BPSK modulation and LLR demodulation
  (reference: ``src/channel/``).
* Monte-Carlo BER/FER simulation sharded over TPU meshes with collective
  reductions (the reference's sequential frame loops, re-designed).

Everything on the device side is batched ("frames" are a leading axis),
jit-compiled, and shardable over a ``jax.sharding.Mesh``.
"""

from .models.polar import (
    PolarEncoder,
    SCDecoder,
    SCLDecoder,
    CASCLDecoder,
    AdaptiveCASCLDecoder,
    construct_polar_code,
    bhattacharyya_bounds,
    gaussian_approximation,
    calculate_channel_capacities,
    generate_frozen_bits,
    crc_encode,
    crc_check,
    polar_transform,
)
from .models.ldpc import (
    LDPCEncoder,
    BPDecoder,
    LayeredMSDecoder,
    MSDecoder,
    NMSDecoder,
    OMSDecoder,
    generate_ldpc_matrix,
    mackay_construction,
    regular_construction,
    qc_base_matrix,
    qc_expand,
    qc_ldpc_construction,
    QCBPDecoder,
    peg_construction,
    create_systematic_generator,
    check_matrix_rank,
    gf2_rank,
    calculate_girth,
)
from .channels import AWGNChannel, BSCChannel, RayleighFadingChannel, RicianFadingChannel

__version__ = "0.1.0"

__all__ = [
    "PolarEncoder",
    "SCDecoder",
    "SCLDecoder",
    "CASCLDecoder",
    "AdaptiveCASCLDecoder",
    "construct_polar_code",
    "bhattacharyya_bounds",
    "gaussian_approximation",
    "calculate_channel_capacities",
    "generate_frozen_bits",
    "crc_encode",
    "crc_check",
    "polar_transform",
    "LDPCEncoder",
    "BPDecoder",
    "LayeredMSDecoder",
    "MSDecoder",
    "NMSDecoder",
    "OMSDecoder",
    "generate_ldpc_matrix",
    "mackay_construction",
    "regular_construction",
    "qc_base_matrix",
    "qc_expand",
    "qc_ldpc_construction",
    "QCBPDecoder",
    "peg_construction",
    "create_systematic_generator",
    "check_matrix_rank",
    "gf2_rank",
    "calculate_girth",
    "AWGNChannel",
    "BSCChannel",
    "RayleighFadingChannel",
    "RicianFadingChannel",
]
