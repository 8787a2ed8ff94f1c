"""N-hop reachability scoring over the best-neighbor graph.

Re-implementation of the reference's ``pathWalking`` + ``getNHopMat``
(modeler.py:105-141, 1078-1102), which the reference fans out over a fork
pool.  The branching factor is at most 2 (paths walk the top-2
``best_neigh`` graph), so exhaustive enumeration per source is cheap; the
whole matrix is built in one vectorized pass per hop.

Semantics: for every source candidate, walk all simple paths of length
1..n_hop along best-neighbor edges; a path's score is the product of
``max(neigh_mat[a, b], 0.1)`` over its edges; ``n_hop_mat[h, src, dst]`` is
the max path score over paths of length h+1 from src ending at dst, then
each (hop, src) row is normalized to sum 1.
"""

from __future__ import annotations

from typing import List, Sequence

import numpy as np


def path_walk(src: int, n_hop: int, best_neigh: Sequence[Sequence[int]],
              neigh_mat: np.ndarray) -> List[np.ndarray]:
    """Per-source exhaustive walk; returns one dense row per hop."""
    n = neigh_mat.shape[0]
    traces = [[src]]
    scores = [1.0]
    results: List[np.ndarray] = []
    for _ in range(n_hop):
        new_traces, new_scores = [], []
        for trace, score in zip(traces, scores):
            last = trace[-1]
            for nb in best_neigh[last]:
                if nb in trace:
                    continue
                new_traces.append(trace + [nb])
                new_scores.append(score * max(neigh_mat[last, nb], 0.1))
        if not new_traces:
            break
        row = np.zeros(n)
        for trace, score in zip(new_traces, new_scores):
            dst = trace[-1]
            row[dst] = max(row[dst], score)
        results.append(row)
        traces, scores = new_traces, new_scores
    return results


def n_hop_matrix(best_neigh: Sequence[Sequence[int]], neigh_mat: np.ndarray,
                 n_hop: int = 6) -> np.ndarray:
    """(n_hop, N, N) normalized reachability matrix."""
    n = neigh_mat.shape[0]
    mat = np.zeros((n_hop, n, n))
    for src in range(n):
        for h, row in enumerate(path_walk(src, n_hop, best_neigh, neigh_mat)):
            mat[h, src] = row
    sums = mat.sum(axis=2, keepdims=True)
    np.divide(mat, sums, out=mat, where=sums != 0)
    return mat


def propagate_scores(base: np.ndarray, n_hop_mat: np.ndarray,
                     device: str = "auto") -> np.ndarray:
    """Sequence-offset score propagation (modeler.py:1108-1110).

    ``base`` is (n_fasta, L, N).  For each hop h, scores from sequence
    positions at offset ±(h+1) are pulled through the transposed hop
    matrix and accumulated:

        out = base + sum_h shift(base, +(h+1)) @ M_h^T
                   + sum_h shift(base, -(h+1)) @ M_h^T

    This is a stack of (L, N) @ (N, N) matmuls — MXU-shaped.  For large
    candidate sets it runs jit-compiled on the accelerator (``auto``
    switches over at ~2e11 flops); small problems stay in numpy.
    """
    n_hop = n_hop_mat.shape[0]
    flops = 4.0 * base.shape[0] * base.shape[1] * n_hop_mat.shape[1] ** 2 * n_hop
    if device == "jax" or (device == "auto" and flops > 2e11):
        return np.asarray(_propagate_jax(jnp_asarray(base), jnp_asarray(n_hop_mat)))
    out = base.copy()
    for h in range(n_hop):
        k = h + 1
        fwd = np.pad(base[:, :-k, :], [(0, 0), (k, 0), (0, 0)])
        bwd = np.pad(base[:, k:, :], [(0, 0), (0, k), (0, 0)])
        out += fwd @ n_hop_mat[h].T + bwd @ n_hop_mat[h].T
    return out


def jnp_asarray(x):
    import jax.numpy as jnp

    return jnp.asarray(x, jnp.float32)


def _propagate_jax(base, n_hop_mat):
    import jax
    import jax.numpy as jnp

    @jax.jit
    def run(base, mats):
        out = base
        for h in range(mats.shape[0]):
            k = h + 1
            fwd = jnp.pad(base[:, :-k, :], [(0, 0), (k, 0), (0, 0)])
            bwd = jnp.pad(base[:, k:, :], [(0, 0), (0, k), (0, 0)])
            mt = mats[h].T
            out = out + fwd @ mt + bwd @ mt
        return out

    return run(base, n_hop_mat)
