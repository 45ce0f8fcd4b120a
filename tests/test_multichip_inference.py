"""Multi-chip offline inference: sharded predictor matches single-device.

Runs on the conftest-provided 8-device virtual CPU mesh. The design
(parallel/mesh.py inference_shardings): frames sharded for feature
extraction, queries sharded for refinement, GSPMD inserts the
feature-grid all-gather in between.
"""

import jax
import jax.numpy as jnp
import numpy as np

from tapnet_tpu import inference
from tapnet_tpu.models import tapir as tapir_lib
from tapnet_tpu.parallel import mesh as mesh_lib


class TestMultichipInference:

  def test_sharded_matches_single_device(self):
    # Dryrun-sized config: GSPMD compile time on the virtual CPU mesh is
    # what dominates this test — the FULL default config (12 mixer blocks)
    # did not compile within 9 minutes here, while the sharding code paths
    # (frame/query sharding + the inserted feature-grid all-gather) are
    # identical at any depth (same rationale as __graft_entry__.py's
    # dryrun config).
    config = tapir_lib.TapirConfig(
        num_mixer_blocks=2,
        num_pips_iter=2,
        pyramid_level=0,
        initial_resolution=(32, 32),
        blocks_per_group=(1, 1, 1, 1),
    )
    model = tapir_lib.TAPIR(config=config)
    rng = np.random.RandomState(0)
    video = jnp.asarray(
        rng.rand(1, 8, 64, 64, 3).astype(np.float32) * 2 - 1
    )
    queries = jnp.asarray(
        np.stack(
            [
                rng.randint(0, 8, 16).astype(np.float32),
                rng.rand(16) * 64,
                rng.rand(16) * 64,
            ],
            -1,
        )[None]
    )
    params = model.init(
        jax.random.PRNGKey(0), video[:, :2], queries[:, :4]
    )["params"]

    base = inference.TapirPredictor(
        params, config=config, query_bucket=16, query_chunk_size=None
    )
    out_base = base(video, queries)

    mesh = mesh_lib.make_mesh(model_parallel=1)
    sharded = inference.TapirPredictor(
        params,
        config=config,
        query_bucket=16,
        query_chunk_size=None,
        mesh=mesh,
    )
    out_sharded = sharded(video, queries)

    np.testing.assert_allclose(
        out_base["tracks"], out_sharded["tracks"], rtol=1e-4, atol=1e-3
    )
    np.testing.assert_allclose(
        out_base["occlusion"],
        out_sharded["occlusion"],
        rtol=1e-4,
        atol=1e-3,
    )
