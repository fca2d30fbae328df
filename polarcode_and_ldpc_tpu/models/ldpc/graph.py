"""Tanner graph in dense padded-edge layout for TPU message passing.

The reference builds Python adjacency lists plus index maps
(``src/ldpc/decoder.py:35-60``) and loops over nodes.  On TPU, messages live
in two dense layouts:

* **check-major** ``[m, dc_max]`` — one row per check node, one slot per
  incident edge (padded; MacKay rows are not exactly regular,
  ``matrix.py:46-49``);
* **var-major** ``[n, dv_max]`` — one row per variable node.

The two layouts are linked by *static* gather indices built here on the host:
``cv_gather`` pulls var-major messages into check-major order and
``vc_gather`` the reverse.  A decoder iteration is then two static gathers,
row-wise leave-one-out reductions, and elementwise math — no scatters, no
dynamic shapes.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax.numpy as jnp
import numpy as np


MATMUL_PERMUTE_MAX_SLOTS = 4096  # one-hot permute matrices up to 64 MB f32


@dataclass
class TannerGraph:
    m: int
    n: int
    num_edges: int
    dc_max: int
    dv_max: int
    # check-major
    check_vars: jnp.ndarray    # [m, dc_max] int32 — variable index per slot (0-padded)
    check_mask: jnp.ndarray    # [m, dc_max] bool — valid slots
    cv_gather: jnp.ndarray     # [m, dc_max] int32 — flat var-major edge index
    # var-major
    var_checks: jnp.ndarray    # [n, dv_max] int32 — check index per slot (0-padded)
    var_mask: jnp.ndarray      # [n, dv_max] bool
    vc_gather: jnp.ndarray     # [n, dv_max] int32 — flat check-major edge index
    # optional one-hot permutation matrices: XLA lowers flat gathers to
    # scalar-ish code on TPU, while a one-hot matmul rides the MXU and is
    # exact (each row selects exactly one message).  Built only for codes
    # small enough that the [slots, slots] f32 matrix is cheap.
    cv_permute: jnp.ndarray = None  # [m·dc_max, n·dv_max] f32 or None
    vc_permute: jnp.ndarray = None  # [n·dv_max, m·dc_max] f32 or None

    @classmethod
    def from_H(cls, H: np.ndarray) -> "TannerGraph":
        H = (np.asarray(H) % 2).astype(np.int8)
        m, n = H.shape
        check_neighbors = [np.nonzero(H[c])[0] for c in range(m)]
        var_neighbors = [np.nonzero(H[:, v])[0] for v in range(n)]
        dc_max = max(1, max(len(x) for x in check_neighbors))
        dv_max = max(1, max(len(x) for x in var_neighbors))

        check_vars = np.zeros((m, dc_max), np.int32)
        check_mask = np.zeros((m, dc_max), bool)
        var_checks = np.zeros((n, dv_max), np.int32)
        var_mask = np.zeros((n, dv_max), bool)
        # slot of edge (c, v) in each layout
        slot_in_check: dict[tuple[int, int], int] = {}
        slot_in_var: dict[tuple[int, int], int] = {}
        for c, nbrs in enumerate(check_neighbors):
            for s, v in enumerate(nbrs):
                check_vars[c, s] = v
                check_mask[c, s] = True
                slot_in_check[(c, int(v))] = s
        for v, nbrs in enumerate(var_neighbors):
            for s, c in enumerate(nbrs):
                var_checks[v, s] = c
                var_mask[v, s] = True
                slot_in_var[(int(c), v)] = s

        cv_gather = np.zeros((m, dc_max), np.int32)
        for c, nbrs in enumerate(check_neighbors):
            for s, v in enumerate(nbrs):
                cv_gather[c, s] = int(v) * dv_max + slot_in_var[(c, int(v))]
        vc_gather = np.zeros((n, dv_max), np.int32)
        for v, nbrs in enumerate(var_neighbors):
            for s, c in enumerate(nbrs):
                vc_gather[v, s] = int(c) * dc_max + slot_in_check[(int(c), v)]

        cv_permute = vc_permute = None
        cm_slots, vm_slots = m * dc_max, n * dv_max
        if max(cm_slots, vm_slots) <= MATMUL_PERMUTE_MAX_SLOTS:
            cv_p = np.zeros((cm_slots, vm_slots), np.float32)
            cv_p[np.arange(cm_slots), cv_gather.reshape(-1)] = 1.0
            vc_p = np.zeros((vm_slots, cm_slots), np.float32)
            vc_p[np.arange(vm_slots), vc_gather.reshape(-1)] = 1.0
            cv_permute, vc_permute = jnp.asarray(cv_p), jnp.asarray(vc_p)

        return cls(
            m=m, n=n, num_edges=int(H.sum()), dc_max=dc_max, dv_max=dv_max,
            check_vars=jnp.asarray(check_vars), check_mask=jnp.asarray(check_mask),
            cv_gather=jnp.asarray(cv_gather),
            var_checks=jnp.asarray(var_checks), var_mask=jnp.asarray(var_mask),
            vc_gather=jnp.asarray(vc_gather),
            cv_permute=cv_permute, vc_permute=vc_permute,
        )

    # -- device helpers -------------------------------------------------------
    def _permutable(self, msgs, permute) -> bool:
        # the MXU path needs f32 (f64 parity runs keep the exact gathers)
        return permute is not None and msgs.dtype in (jnp.float32, jnp.bfloat16)

    def gather_var_to_check(self, msgs_var):
        """[batch, n, dv_max] → [batch, m, dc_max] (check-major view)."""
        flat = msgs_var.reshape(*msgs_var.shape[:-2], self.n * self.dv_max)
        if self._permutable(msgs_var, self.cv_permute):
            out = jnp.matmul(flat.astype(jnp.float32), self.cv_permute.T,
                             preferred_element_type=jnp.float32)
            return out.astype(msgs_var.dtype).reshape(
                *msgs_var.shape[:-2], self.m, self.dc_max)
        return flat[..., self.cv_gather.reshape(-1)].reshape(
            *msgs_var.shape[:-2], self.m, self.dc_max)

    def gather_check_to_var(self, msgs_check):
        """[batch, m, dc_max] → [batch, n, dv_max] (var-major view)."""
        flat = msgs_check.reshape(*msgs_check.shape[:-2], self.m * self.dc_max)
        if self._permutable(msgs_check, self.vc_permute):
            out = jnp.matmul(flat.astype(jnp.float32), self.vc_permute.T,
                             preferred_element_type=jnp.float32)
            return out.astype(msgs_check.dtype).reshape(
                *msgs_check.shape[:-2], self.n, self.dv_max)
        return flat[..., self.vc_gather.reshape(-1)].reshape(
            *msgs_check.shape[:-2], self.n, self.dv_max)

    def syndrome(self, bits):
        """H·bits mod 2 per frame: ``[batch, n] → [batch, m]`` via gathers."""
        at_checks = bits[..., self.check_vars] * self.check_mask
        return jnp.sum(at_checks.astype(jnp.int32), axis=-1) % 2
