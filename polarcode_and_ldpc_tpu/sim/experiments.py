"""High-level experiments mirroring the reference benchmark scripts
(``benchmarks/ber_simulation.py``, ``test_snr_curves.py``,
``test_code_parameters.py``, ``sc_vs_scl.py``) as importable functions.

Each experiment builds jitted Monte-Carlo pipelines (``sim.pipelines``),
runs them through the sharded chunked driver (``sim.montecarlo``), and
returns dicts in the reference's results-JSON schemas so downstream tooling
(plots, analysis) is drop-in compatible.
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np

from ..core.config import ChannelConfig, LDPCCodeConfig, PolarCodeConfig, SimulationConfig
from ..models.ldpc.encoder import LDPCEncoder
from ..models.polar.construction import construct_polar_code
from .pipelines import make_channel_fn, make_ldpc_pipeline, make_polar_pipeline
from .sweep import run_snr_sweep


def _polar_decoder_name(cfg: PolarCodeConfig) -> str:
    return {"sc": "sc", "scl": "scl", "ca_scl": "ca-scl",
            "ca-scl": "ca-scl"}[cfg.algorithm]


def _channel_builder(channel: Optional[ChannelConfig]):
    """snr_db → channel_fn for the configured channel kind (None → AWGN)."""
    if channel is None or channel.kind == "awgn":
        return lambda snr: None  # pipelines default to AWGN at that snr
    return lambda snr: make_channel_fn(channel.kind, snr_db=snr,
                                       crossover_prob=channel.crossover_prob,
                                       k_factor=channel.k_factor)


def simulate_polar(
    cfg: PolarCodeConfig,
    sim: SimulationConfig,
    mesh=None,
    verbose: bool = False,
    channel: Optional[ChannelConfig] = None,
    frozen: Optional[np.ndarray] = None,
) -> dict:
    """Polar BER/FER curve (reference ``simulate_polar``,
    ``ber_simulation.py:132-205``).

    ``frozen`` overrides the construction with an explicit frozen set —
    the oracle-differential path feeds the third-party construction's
    positions here, mirroring how the reference's production runs inject
    ``polarcodes`` frozen sets (``ber_simulation.py:145-152``)."""
    if frozen is None:
        frozen, _ = construct_polar_code(cfg.N, cfg.K, cfg.construction,
                                         cfg.design_snr_db)
    decoder = _polar_decoder_name(cfg)
    use_crc = cfg.use_crc or decoder == "ca-scl"

    chan = _channel_builder(channel)

    def builder(snr_db):
        return make_polar_pipeline(
            cfg.N, cfg.K, frozen, snr_db, decoder=decoder,
            list_size=cfg.list_size, use_crc=use_crc,
            crc_polynomial=cfg.crc_polynomial, channel_fn=chan(snr_db),
            scl_body_impl=cfg.scl_body_impl, scl_chunk=cfg.scl_chunk,
            scl_control_impl=cfg.scl_control_impl,
            scl_node_mode=cfg.scl_node_mode)

    k_counted = cfg.K - (int(cfg.crc_polynomial.split("-")[1]) if use_crc else 0)
    out = run_snr_sweep(builder, k_counted, sim.snr_points(),
                        num_frames=sim.num_frames, max_errors=sim.max_errors,
                        seed=sim.seed, chunk_frames=sim.batch_size, mesh=mesh,
                        verbose=verbose,
                        chunks_per_dispatch=sim.chunks_per_dispatch)
    out["config"] = {"N": cfg.N, "K": cfg.K, "rate": cfg.rate,
                     "decoder": decoder, "list_size": cfg.list_size,
                     "use_crc": use_crc, "construction": cfg.construction}
    return out


def simulate_ldpc(
    cfg: LDPCCodeConfig,
    sim: SimulationConfig,
    mesh=None,
    verbose: bool = False,
    H: Optional[np.ndarray] = None,
    channel: Optional[ChannelConfig] = None,
) -> dict:
    """LDPC BER/FER curve (reference ``simulate_ldpc``,
    ``ber_simulation.py:208-293``)."""
    enc = LDPCEncoder(cfg.n, cfg.k, H=H, dv=cfg.dv, dc=cfg.dc, seed=cfg.seed,
                      method=cfg.construction)
    decoder = {"bp": "bp", "min_sum": "ms", "ms": "ms", "nms": "nms",
               "oms": "oms"}[cfg.algorithm]
    norm = cfg.normalization if decoder in ("ms", "nms") else 1.0
    offset = cfg.offset if decoder == "oms" else 0.0

    chan = _channel_builder(channel)

    def builder(snr_db):
        return make_ldpc_pipeline(
            enc.H, enc.G, snr_db, decoder=decoder, max_iter=cfg.max_iterations,
            normalization=norm, offset=offset, early_stop=cfg.early_stop,
            message_idx=enc.info_positions, channel_fn=chan(snr_db),
            bp_impl=cfg.bp_impl)

    out = run_snr_sweep(builder, enc.k, sim.snr_points(),
                        num_frames=sim.num_frames, max_errors=sim.max_errors,
                        seed=sim.seed, chunk_frames=sim.batch_size, mesh=mesh,
                        verbose=verbose,
                        chunks_per_dispatch=sim.chunks_per_dispatch)
    out["config"] = {"n": cfg.n, "k": enc.k, "rate": enc.k / cfg.n,
                     "dv": cfg.dv, "dc": cfg.dc, "decoder": decoder,
                     "max_iterations": cfg.max_iterations}
    return out


def run_ber_simulation(
    polar_cfg: Optional[PolarCodeConfig] = None,
    ldpc_cfg: Optional[LDPCCodeConfig] = None,
    sim: Optional[SimulationConfig] = None,
    mesh=None,
    use_oracle: bool = False,
    verbose: bool = False,
    channel: Optional[ChannelConfig] = None,
) -> dict:
    """Combined polar + LDPC BER study (reference ``run_ber_simulation``,
    ``ber_simulation.py:24-129``).  ``use_oracle`` adds third-party library
    curves when ``polarcodes``/``pyldpc`` are installed (reference
    ``--use-third-party``)."""
    sim = sim or SimulationConfig()
    results: dict = {"snr_range": sim.snr_points()}
    if polar_cfg is not None:
        if verbose:
            print(f"Polar N={polar_cfg.N} K={polar_cfg.K} "
                  f"({_polar_decoder_name(polar_cfg)}):")
        results["polar"] = {"self": simulate_polar(polar_cfg, sim, mesh, verbose,
                                                   channel=channel)}
    if ldpc_cfg is not None:
        if verbose:
            print(f"LDPC n={ldpc_cfg.n} k={ldpc_cfg.k} ({ldpc_cfg.algorithm}):")
        results["ldpc"] = {"self": simulate_ldpc(ldpc_cfg, sim, mesh, verbose,
                                                 channel=channel)}
    if use_oracle:
        from ..oracle import oracle_available

        if oracle_available("polar") and polar_cfg is not None:
            from ..oracle.polar_oracle import simulate_polar_oracle

            results["polar"]["library"] = simulate_polar_oracle(polar_cfg, sim)
        if oracle_available("ldpc") and ldpc_cfg is not None:
            from ..oracle.ldpc_oracle import simulate_ldpc_oracle

            results["ldpc"]["library"] = simulate_ldpc_oracle(ldpc_cfg, sim)
    return results


def test_multiple_rates(
    family: str,
    rates: Sequence[float] = (0.5, 2 / 3, 0.75, 5 / 6),
    N: int = 1024,
    sim: Optional[SimulationConfig] = None,
    mesh=None,
    verbose: bool = False,
    algorithm: Optional[str] = None,
    list_size: int = 8,
    polar_perf: Optional[dict] = None,
) -> dict:
    """Rate sweep (reference ``test_snr_curves.py:166-239``): one BER/FER
    curve per code rate.

    ``algorithm`` selects the polar decoder (``sc`` default; ``ca_scl`` is
    the flagship configuration — runtime-SNR pipelines make the whole curve
    cost one compile, so list decoding is affordable here) or the LDPC
    decoder (``bp`` default).
    """
    sim = sim or SimulationConfig(snr_start=-2, snr_stop=5, snr_step=1,
                                  num_frames=100, max_errors=100)
    out: dict = {"self": {}}
    for rate in rates:
        label = f"{rate:.2f}"
        if family == "polar":
            K = int(round(N * rate))
            if (algorithm or "sc") in ("scl", "ca_scl", "ca-scl"):
                # flagship list-decoding study: DE-GA with rate-matched
                # design SNRs (high-rate codes polarize usefully only when
                # designed near their operating point)
                construction, design = "dega", (
                    2.0 if rate <= 0.7 else 3.5 if rate <= 0.8 else 4.5)
            else:
                construction, design = "bhattacharyya", 2.0
            cfg = PolarCodeConfig(N=N, K=K, algorithm=algorithm or "sc",
                                  list_size=list_size,
                                  construction=construction,
                                  design_snr_db=design,
                                  **(polar_perf or {}))
            res = simulate_polar(cfg, sim, mesh, verbose)
        elif family == "ldpc":
            k = int(round(N * rate))
            # keep dv=3; dc from the rate: dv·n = dc·m ⇒ dc = dv·n/(n−k)
            m = N - k
            dc = max(4, int(round(3 * N / m)))
            cfg = LDPCCodeConfig(n=N, k=k, dv=3, dc=dc,
                                 algorithm=algorithm or "bp")
            res = simulate_ldpc(cfg, sim, mesh, verbose)
        else:
            raise ValueError(f"unknown family {family!r}")
        if verbose:
            print(f"[{family} rate {label}] done")
        out["self"][label] = res
    return out


def analyze_snr_requirements(
    results_by_rate: dict,
    target_bers: Sequence[float] = (1e-3, 1e-5),
) -> dict:
    """First SNR achieving each target BER, per rate (reference
    ``test_snr_curves.py:355-408``)."""
    analysis: dict = {}
    for target in target_bers:
        key = f"ber_{target:.0e}".replace("e-0", "e-")
        analysis[key] = {}
        for rate, res in results_by_rate.items():
            snrs, bers = res["snr_db"], res["ber"]
            req = None
            for s, b in zip(snrs, bers):
                if b < target:
                    req = s
                    break
            analysis[key][rate] = req
    return analysis


def test_code_lengths(
    family: str,
    lengths: Sequence[int],
    rate: float = 0.5,
    snr_db: float = 3.0,
    num_frames: int = 256,
    batch_size: int = 256,
    mesh=None,
    sc_impl: str = "unrolled",
) -> list[dict]:
    """Code-length sweep at fixed rate (reference
    ``test_code_parameters.py:29-157``): per-length BER/FER + throughput.

    ``sc_impl="mega"`` routes the polar throughput probes through the
    whole-decode Pallas kernel (TPU: ~1.5x faster AND compiles in
    seconds per length instead of minutes — the sweep's former cost)."""
    from .throughput import measure_ldpc_throughput, measure_polar_throughput

    out = []
    for N in lengths:
        entry: dict = {"length": N, "rate": rate}
        try:
            if family == "polar":
                K = int(N * rate)
                cfg = PolarCodeConfig(N=N, K=K, algorithm="sc")
                sim = SimulationConfig(snr_start=snr_db, snr_stop=snr_db,
                                       snr_step=1, num_frames=num_frames,
                                       max_errors=None, batch_size=batch_size)
                curve = simulate_polar(cfg, sim, mesh)
                thpt = measure_polar_throughput(N=N, K=K, snr_db=snr_db,
                                                batch=batch_size,
                                                sc_impl=sc_impl)
            else:
                k = int(N * rate)
                cfg = LDPCCodeConfig(n=N, k=k)
                sim = SimulationConfig(snr_start=snr_db, snr_stop=snr_db,
                                       snr_step=1, num_frames=num_frames,
                                       max_errors=None, batch_size=batch_size)
                curve = simulate_ldpc(cfg, sim, mesh)
                thpt = measure_ldpc_throughput(n=N, k=k, snr_db=snr_db,
                                               batch=batch_size)
            entry.update(ber=curve["ber"][0], fer=curve["fer"][0],
                         encoding_throughput=thpt["encoding_throughput"],
                         decoding_throughput=thpt["decoding_throughput"],
                         decode_ms_per_frame=thpt["decode_ms_per_frame"])
        except Exception as e:  # reference records failures as None (:135-142)
            entry["error"] = str(e)
        out.append(entry)
    return out
