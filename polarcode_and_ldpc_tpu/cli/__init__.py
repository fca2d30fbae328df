"""Command-line entry points mirroring the reference ``benchmarks/`` scripts:

* ``python -m polarcode_and_ldpc_tpu.cli.run_benchmark`` — BER + throughput +
  complexity (reference ``run_benchmark.py``)
* ``python -m polarcode_and_ldpc_tpu.cli.snr_curves`` — multi-rate SNR study
  (reference ``test_snr_curves.py``)
* ``python -m polarcode_and_ldpc_tpu.cli.code_params`` — length/rate sweeps
  (reference ``test_code_parameters.py``)
* ``python -m polarcode_and_ldpc_tpu.cli.sc_vs_scl`` — SC vs SCL comparison
  (reference ``sc_vs_scl.py``)
* ``python -m polarcode_and_ldpc_tpu.cli.oracle_differential`` — self vs
  oracle-constructed codes, curves overlaid (the reference's
  ``--use-third-party`` acceptance experiment, executable without the
  libraries via ``oracle/constructions_np.py``)
"""
