"""Multi-host distribution — jax.distributed over ICI/DCN.

Replaces the reference's ggml-rpc multi-node story (SURVEY §5.8: a bespoke
TCP protocol replaying cgraphs on a remote backend) with the TPU-native
model: every host runs the SAME program, jax.distributed stitches the
processes into one device mesh, GSPMD partitions the jitted decode step,
and collectives ride ICI within a slice / DCN across slices.

Usage (each host):
    from ggml_hexagon_tpu.parallel import distributed
    distributed.init(coordinator="host0:8476", num_processes=2, process_id=i)
    mesh = distributed.global_mesh(tp=8, dp=num_hosts)
    ... shard_llama_weights(weights, cfg, mesh) ...

Single-host multi-chip needs no init at all — make_mesh over jax.devices().
"""
from __future__ import annotations

import os

import jax
import numpy as np
from jax.sharding import Mesh


def init(
    coordinator: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
):
    """Initialize jax.distributed.  On TPU pods with standard env vars all
    arguments auto-detect; on CPU/GPU clusters pass them explicitly."""
    kw = {}
    if coordinator is not None:
        kw["coordinator_address"] = coordinator
    if num_processes is not None:
        kw["num_processes"] = num_processes
    if process_id is not None:
        kw["process_id"] = process_id
    jax.distributed.initialize(**kw)


def global_mesh(dp: int = 1, tp: int | None = None) -> Mesh:
    """Mesh over ALL processes' devices: tp fastest (intra-host/ICI first so
    tensor-parallel collectives stay off DCN), dp across the rest."""
    devs = jax.devices()  # global device list, process-major
    n = len(devs)
    if tp is None:
        tp = n // dp
    assert dp * tp == n, f"dp*tp = {dp*tp} != {n} devices"
    arr = np.array(devs).reshape(dp, tp)
    return Mesh(arr, axis_names=("dp", "tp"))


def process_info() -> dict:
    return {
        "process_index": jax.process_index(),
        "process_count": jax.process_count(),
        "local_devices": len(jax.local_devices()),
        "global_devices": len(jax.devices()),
    }
