"""Polar codes: construction, CRC, encoder, SC / SCL / CA-SCL decoders."""

from .construction import (
    bhattacharyya_bounds,
    gaussian_approximation,
    dega_llr_means,
    construct_polar_code,
    calculate_channel_capacities,
    generate_frozen_bits,
    monte_carlo_reliabilities,
    genie_leaf_llrs,
    bit_reverse,
    bit_reverse_array,
    bit_reverse_permutation,
    frozen_mask_from_positions,
)
from .crc import CRC_POLYNOMIALS, CRCCodec, crc_encode, crc_check
from .encoder import PolarEncoder, polar_transform
from .sc import SCDecoder, make_sc_decoder
from .scl import SCLDecoder, CASCLDecoder, make_scl_decoder
from .adaptive import AdaptiveCASCLDecoder

__all__ = [
    "bhattacharyya_bounds",
    "gaussian_approximation",
    "dega_llr_means",
    "construct_polar_code",
    "calculate_channel_capacities",
    "generate_frozen_bits",
    "monte_carlo_reliabilities",
    "genie_leaf_llrs",
    "bit_reverse",
    "bit_reverse_array",
    "bit_reverse_permutation",
    "frozen_mask_from_positions",
    "CRC_POLYNOMIALS",
    "CRCCodec",
    "crc_encode",
    "crc_check",
    "PolarEncoder",
    "polar_transform",
    "SCDecoder",
    "make_sc_decoder",
    "SCLDecoder",
    "CASCLDecoder",
    "AdaptiveCASCLDecoder",
    "make_scl_decoder",
]
