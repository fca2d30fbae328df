"""LDPC codes: H construction, GF(2) encoder, BP / Min-Sum decoders."""

from .matrix import (
    mackay_construction,
    regular_construction,
    qc_base_matrix,
    qc_expand,
    qc_ldpc_construction,
    generate_ldpc_matrix,
    peg_construction,
    create_systematic_generator,
    check_matrix_rank,
    gf2_rank,
    calculate_girth,
)
from .graph import TannerGraph
from .encoder import LDPCEncoder
from .bp import BPDecoder
from .qc import QCBPDecoder, make_qc_bp_decoder
from .minsum import MSDecoder, NMSDecoder, OMSDecoder
from .layered import LayeredMSDecoder, make_layered_ms_decoder
from .utils import (
    create_tanner_graph,
    check_syndrome,
    calculate_syndrome,
    count_errors,
    hamming_distance,
)

__all__ = [
    "mackay_construction",
    "regular_construction",
    "qc_base_matrix",
    "qc_expand",
    "qc_ldpc_construction",
    "generate_ldpc_matrix",
    "peg_construction",
    "create_systematic_generator",
    "check_matrix_rank",
    "gf2_rank",
    "calculate_girth",
    "TannerGraph",
    "LDPCEncoder",
    "BPDecoder",
    "QCBPDecoder",
    "make_qc_bp_decoder",
    "MSDecoder",
    "LayeredMSDecoder",
    "make_layered_ms_decoder",
    "NMSDecoder",
    "OMSDecoder",
    "create_tanner_graph",
    "check_syndrome",
    "calculate_syndrome",
    "count_errors",
    "hamming_distance",
]
