"""Subprocess worker for the 2-process multi-host test (not a pytest file).

Usage: python multihost_worker.py <pid> <nproc> <coordinator> <out_file>

Each process holds 2 CPU devices (global mesh = nproc*2), initializes
jax.distributed through the production wiring
(``parallel.distributed.maybe_initialize_distributed``), loads its local
slice of every global batch through the production ``DataLoader`` process
slicing, assembles global arrays with ``mesh.shard_batch``, and runs two DP
train steps of the tiny NeRF renderer.  Prints the final loss; the test
compares it against a single-process run of the identical computation.
"""

import pathlib
import sys

import numpy as np


def _cache_setup():
    import jax

    sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent))
    from _cache import setup_compilation_cache

    setup_compilation_cache(jax)


def run(pid: int, nproc: int, coordinator: str):
    import os

    import jax

    jax.config.update("jax_platforms", "cpu")
    # 2 devices per process; the single-process reference run gets all 4 so
    # both runs use an identical 4-device mesh (same reduction tree).
    jax.config.update("jax_num_cpu_devices", 4 // nproc)
    _cache_setup()

    sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
    from nerfmatch_tpu.parallel.distributed import maybe_initialize_distributed

    if nproc > 1:
        os.environ["NERFMATCH_COORDINATOR"] = coordinator
        os.environ["NERFMATCH_NUM_PROCESSES"] = str(nproc)
        os.environ["NERFMATCH_PROCESS_ID"] = str(pid)
    got_pid, got_nproc = maybe_initialize_distributed()
    assert (got_pid, got_nproc) == (pid, nproc), (got_pid, got_nproc)
    return train_losses()


def train_losses():
    """Two DP train steps on the tiny renderer; identical global semantics
    regardless of process count."""
    import jax
    import jax.numpy as jnp
    import optax

    import __graft_entry__ as ge
    from nerfmatch_tpu.data.loaders import DataLoader
    from nerfmatch_tpu.parallel.distributed import process_info
    from nerfmatch_tpu.parallel.mesh import make_mesh, replicate_params, \
        shard_batch

    pid, nproc = process_info()
    n_global_dev = len(jax.devices())
    mesh = make_mesh(data=n_global_dev, model=1)

    cfg = ge._nerf_config(num_pts=8, hid_dim=32, layer_num=3)
    cfg.coarse_nerf.skips = [1]
    cfg.fine_nerf.skips = [1]
    from nerfmatch_tpu.nerf.renderer import NerfRenderer

    renderer = NerfRenderer(cfg)
    params = renderer.init_params(jax.random.PRNGKey(0))
    params = replicate_params(params, mesh)
    opt = optax.adam(1e-3)
    opt_state = opt.init(params)

    # Deterministic synthetic per-ray dataset, identical on every process.
    rays = np.asarray(ge._example_rays(64, key=3))
    rgbs = np.linspace(0, 1, 64 * 3, dtype=np.float32).reshape(64, 3)
    dataset = [{"rays": rays[i], "rgbs": rgbs[i]} for i in range(len(rays))]
    loader = DataLoader(dataset, batch_size=16, shuffle=True, drop_last=True,
                        seed=7, process_index=pid, process_count=nproc)

    @jax.jit
    def step(params, opt_state, rays, rgbs, key):
        def loss_fn(p):
            preds = renderer.render_rays(p, rays, key=key, train=True)
            return jnp.mean((preds["rgb_fine"] - rgbs) ** 2)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = opt.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    losses = []
    key = jax.random.PRNGKey(5)
    for i, batch in enumerate(loader):
        if i >= 2:
            break
        key, k = jax.random.split(key)
        sb = shard_batch(batch, mesh)
        params, opt_state, loss = step(params, opt_state, sb["rays"],
                                       sb["rgbs"], k)
        losses.append(float(loss))
    return losses


if __name__ == "__main__":
    pid, nproc, coordinator, out_file = (
        int(sys.argv[1]), int(sys.argv[2]), sys.argv[3], sys.argv[4])
    losses = run(pid, nproc, coordinator)
    pathlib.Path(out_file).write_text(
        " ".join(f"{x:.9f}" for x in losses))
    print(f"worker {pid}/{nproc} losses: {losses}")
