"""Multi-host bring-up.

The reference has no multi-node story (its DP is simulated file-binning,
SURVEY.md §2.3). Here multi-host is the same code path: initialize the jax
distributed runtime, build the global ("data", "model") mesh over all chips,
and keep per-host data loading aligned with the mesh's data axis.

Usage (same script on every host, e.g. under a TPU pod slice launcher):

    from dynamictreeattn_tpu.parallel.distributed import initialize_multihost
    info = initialize_multihost()            # no-op on single host
    mesh = make_mesh(dp=..., tp=...)         # global devices
    # Each host feeds the data ranks whose devices it owns:
    my_ranks = local_data_ranks(mesh)
"""

from __future__ import annotations

import dataclasses

import jax

__all__ = ["initialize_multihost", "local_data_ranks", "put_global",
           "global_placer", "HostInfo"]


@dataclasses.dataclass(frozen=True)
class HostInfo:
    process_index: int
    process_count: int
    local_devices: int
    global_devices: int


def initialize_multihost(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> HostInfo:
    """Initialize jax.distributed (idempotent; no-op single-host).

    With no arguments, relies on the TPU environment's auto-detection
    (megascale coordinator / metadata), the standard path on Cloud TPU pods.
    """
    if jax.process_count() == 1 and (num_processes or 0) > 1 or coordinator_address:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    else:
        try:
            jax.distributed.initialize()
        except Exception:
            pass  # single-host / already initialized
    return HostInfo(
        process_index=jax.process_index(),
        process_count=jax.process_count(),
        local_devices=len(jax.local_devices()),
        global_devices=len(jax.devices()),
    )


def local_data_ranks(mesh) -> list[int]:
    """Data-axis ranks whose devices live on this host.

    Per-host input pipelines should build tries only for these ranks; with
    the default mesh construction, data ranks map contiguously onto hosts, so
    DP batches stay host-local and gradient psums ride ICI before DCN."""
    local = {d.id for d in jax.local_devices()}
    ranks = []
    devs = mesh.devices  # [dp, ...] — data is the leading mesh axis
    for r in range(devs.shape[0]):
        if any(d.id in local for d in devs[r].flat):
            ranks.append(r)
    return ranks


def global_placer(x, sharding):
    """make_array_from_callback placement for one leaf (the multi-host
    device_put): every process holds the full value, contributes only its
    devices' shards."""
    import numpy as np

    a = np.asarray(x)
    return jax.make_array_from_callback(a.shape, sharding, lambda idx: a[idx])


def put_global(tree, mesh, specs):
    """Place host-replicated numpy/jnp leaves as GLOBAL jax.Arrays sharded
    per `specs` — the multi-host replacement for jax.device_put.

    Every process must hold identical full-size values (the deterministic
    recipe: each host computes stack_batches / init_params on the same
    global inputs); each process contributes only the shards its devices
    own via make_array_from_callback. On a single host this reduces to
    device_put."""
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec

    return jax.tree.map(
        lambda x, spec: global_placer(x, NamedSharding(mesh, spec)),
        tree, specs, is_leaf=lambda x: isinstance(x, PartitionSpec),
    )
