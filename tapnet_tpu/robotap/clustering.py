"""RoboTAP motion clustering: factorize tracks into rigid-motion groups.

Behavioral parity: tapnet/robotap/tapir_clustering.py:42-798. Each cluster k
gets a per-frame 3x4 camera/object transform (Gram-Schmidt-orthonormalized,
4-DoF by default: depth + 2D translation + in-plane rotation) and each point
a 3D location; points are assigned to the cluster whose rigid motion best
reprojects their 2D track. The cluster count is searched by recursive
split-and-delete: three parameter copies (base / fork1 / fork2) are
optimized jointly, each candidate split (replace cluster i by its two forks)
or deletion is scored, and the best is applied with parameter surgery.

Implementation notes (vs. the reference):
  * Parameters are an explicit pytree optimized with optax — no implicit
    module state — which makes the split/delete surgery plain array ops.
  * Feature whitening uses on-the-fly batch standardization rather than
    EMA BatchNorm; the procedure is a per-scene optimization, so the
    statistics are over the same fixed data either way.
"""

from __future__ import annotations

import functools
from typing import Dict, List, Mapping, NamedTuple, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

Array = jnp.ndarray


class ClusterParams(NamedTuple):
  """Learnable state. cat_pred_*: [P_feat, K] coefficient banks mapping point
  features to per-cluster 3D points; mat_pred_*: [F_feat, K*12] mapping frame
  features to per-cluster transforms."""

  point_state: Array  # [N, 64]
  centroids: Array  # [T*3, 384]
  point_w1: Array  # [384, 64]
  point_mlp: Tuple  # residual MLP weights
  frame_state: Array  # [T, 64]
  frame_conv: Array  # [128, 64] grouped temporal smoothing kernel
  frame_mlp: Tuple
  cat_pred_base: Array
  cat_pred_fork1: Array
  cat_pred_fork2: Array
  mat_pred_base: Array
  mat_pred_fork1: Array
  mat_pred_fork2: Array


class ClusterState(NamedTuple):
  params: ClusterParams
  opt_state: optax.OptState
  rng: Array
  step: Array


@jax.custom_vjp
def _clip_grad_identity(x):
  return x


def _cgi_fwd(x):
  return x, ()


def _cgi_bwd(_, g):
  return (jnp.clip(g, -100, 100),)


_clip_grad_identity.defvjp(_cgi_fwd, _cgi_bwd)


def make_projection_matrix(pred_mat: Array, fourdof: bool = True) -> Array:
  """[K_or_T, K*12] raw params -> [*, K, 3, 4] orthonormalized transforms."""
  pred_mat = pred_mat.reshape(pred_mat.shape[:-1] + (-1, 3, 4))
  pred_mat = _clip_grad_identity(pred_mat)
  if fourdof:
    orth1 = jnp.ones_like(pred_mat[..., 0:1, :-1]) * jnp.array(
        [0.0, 0.0, 1.0]
    )
    orth2 = pred_mat[..., 1:2, :-1] * jnp.array([1.0, 1.0, 0.0])
  else:
    orth1 = pred_mat[..., 0:1, :-1]
    orth1 = orth1 * jax.lax.rsqrt(
        jnp.maximum(jnp.sum(jnp.square(orth1), -1, keepdims=True), 1e-12)
    )
    orth2 = pred_mat[..., 1:2, :-1]
    orth2 = orth2 - orth1 * jnp.sum(orth2 * orth1, -1, keepdims=True)
  orth2 = orth2 * jax.lax.rsqrt(
      jnp.maximum(jnp.sum(jnp.square(orth2), -1, keepdims=True), 1e-12)
  )
  orth3 = pred_mat[..., 2:3, :-1]
  if fourdof:
    orth3 = orth3 * jnp.array([1.0, 1.0, 0.0])
  else:
    orth3 = orth3 - orth1 * jnp.sum(orth3 * orth1, -1, keepdims=True)
  orth3 = orth3 - orth2 * jnp.sum(orth3 * orth2, -1, keepdims=True)
  orth3 = orth3 * jax.lax.rsqrt(
      jnp.maximum(jnp.sum(jnp.square(orth3), -1, keepdims=True), 1e-12)
  )
  cross = jnp.cross(orth1, orth2)
  orth3 = orth3 * jnp.sign(jnp.sum(cross * orth3, -1, keepdims=True))
  orth = jnp.concatenate([orth3, orth2, orth1], axis=-2)
  return jnp.concatenate([orth, pred_mat[..., -1:]], axis=-1)


def project(pred_mat, pos_pred, cam_focal_length, rng):
  """Project per-cluster 3D points through per-frame transforms; depth is
  clamped to [0.5, 2] with noise injected out-of-range to push the optimizer
  back in bounds."""
  pos_h = jnp.concatenate(
      [pos_pred[..., :3], jnp.ones_like(pos_pred[..., :1])], axis=-1
  )
  pred_pos = jnp.einsum("fkoi,nki->nfko", pred_mat, pos_h)
  depth = jnp.clip(pred_pos[..., 2:3] + 1.0, 0.5, 2.0)
  oob = jnp.maximum(pred_pos[..., 2:3] - 2.0, 0.0) + jnp.maximum(
      0.5 - pred_pos[..., 2:3], 0.0
  )
  pred_xy = pred_pos[..., 0:2] * cam_focal_length / depth
  pred_xy = pred_xy + 0.1 * jax.random.normal(rng, oob.shape) * oob
  return pred_xy, depth[..., 0]


def _standardize(x, axis=0, eps=1e-5):
  mean = jnp.mean(x, axis=axis, keepdims=True)
  var = jnp.var(x, axis=axis, keepdims=True)
  return (x - mean) * jax.lax.rsqrt(var + eps)


def _mlp_init(rng, sizes):
  ws = []
  for i, (a, b) in enumerate(sizes):
    rng, k = jax.random.split(rng)
    ws.append(
        jax.random.truncated_normal(k, -2, 2, (a, b)) / np.sqrt(a)
    )
  return tuple(ws)


def init_params(
    rng: Array,
    pts: Array,  # [N, T, 2] normalized
    vis: Array,  # [N, T]
    num_cats: int = 1,
) -> ClusterParams:
  """Initializes the optimization state (centroid features from random
  track exemplars, as in the reference's centroid_init)."""
  n, t = pts.shape[:2]
  keys = jax.random.split(rng, 12)
  flat_pts = (pts * vis[..., None]).reshape(n, -1)

  idx = jax.random.randint(keys[0], (384,), 0, n)
  centroid_pts = flat_pts[idx]  # [384, 2T]
  centroid_vis = vis[idx]  # [384, T]
  centroids = jnp.concatenate(
      [centroid_pts, centroid_vis * 100.0], axis=1
  ).T  # [3T, 384]

  point_feat = 3 * 64
  cat_base = jax.random.truncated_normal(
      keys[6], -2, 2, (point_feat * n, num_cats)
  )
  return ClusterParams(
      point_state=jnp.zeros((n, 64)),
      centroids=centroids,
      point_w1=jax.random.truncated_normal(keys[1], -2, 2, (384, 64))
      / np.sqrt(384),
      point_mlp=_mlp_init(
          keys[2], [(64, 64), (64, 32), (32, 64), (64, 32), (32, 64)]
      ),
      frame_state=jax.random.truncated_normal(keys[3], -2, 2, (t, 64)),
      frame_conv=jax.random.truncated_normal(keys[4], -2, 2, (128, 64))
      / np.sqrt(128),
      frame_mlp=_mlp_init(
          keys[5],
          [(64, 128), (128, 64), (64, 128), (128, 64), (64, 128)],
      ),
      cat_pred_base=cat_base,
      # Forks start as near-copies of the base (reference:
      # tapir_clustering.py:191-200) so split candidates begin plausible.
      cat_pred_fork1=cat_base
      + jax.random.truncated_normal(
          keys[7], -2, 2, (point_feat * n, num_cats)
      ) * 1e-4,
      cat_pred_fork2=cat_base
      + jax.random.truncated_normal(
          keys[8], -2, 2, (point_feat * n, num_cats)
      ) * 1e-4,
      mat_pred_base=jax.random.truncated_normal(
          keys[9], -2, 2, (128, num_cats * 12)
      ),
      mat_pred_fork1=jax.random.truncated_normal(
          keys[10], -2, 2, (128, num_cats * 12)
      ),
      mat_pred_fork2=jax.random.truncated_normal(
          keys[11], -2, 2, (128, num_cats * 12)
      ),
  )


def _point_features(params: ClusterParams, pts, vis):
  """Per-point embedding from soft distances to track centroids."""
  n, t = pts.shape[:2]
  flat = (pts * vis[..., None]).reshape(n, -1)
  time_weight = jnp.abs(params.centroids[t * 2 :, :]) / 100.0
  centroids = params.centroids[: t * 2, :]
  vis_tile = jnp.repeat(vis, 2, axis=-1).reshape(n, -1)
  tw_tile = jnp.repeat(time_weight, 2, axis=0)

  dists = jnp.square(flat * vis_tile) @ jnp.square(tw_tile)
  dists -= 2 * (flat * vis_tile) @ (centroids * tw_tile)
  dists += jnp.square(vis_tile) @ jnp.square(centroids * tw_tile)
  dists = jnp.exp(-dists * 10.0)
  dists = dists / jnp.maximum(dists.sum(-1, keepdims=True), 1e-8)

  state = params.point_state + dists @ params.point_w1
  state = _standardize(state)
  w = params.point_mlp
  state = jax.nn.relu(state @ w[0])
  state = state + jax.nn.relu(_standardize(state @ w[1])) @ w[2]
  state = state + jax.nn.relu(_standardize(state @ w[3])) @ w[4]
  return state  # [N, 64]


def _frame_features(params: ClusterParams, sequence_boundaries):
  """Per-frame embedding, temporally smoothed within each sequence."""
  chunks = []
  for lo, hi in sequence_boundaries:
    seg = params.frame_state[lo:hi]  # [t, 64]
    # Grouped temporal conv (kernel 128, per-channel), SAME padding.
    kernel = params.frame_conv  # [128, 64]
    seg = jax.lax.conv_general_dilated(
        seg[None],
        kernel[:, None, :],
        window_strides=(1,),
        padding="SAME",
        dimension_numbers=("NWC", "WIO", "NWC"),
        feature_group_count=seg.shape[-1],
    )[0]
    chunks.append(seg)
  state = jnp.concatenate(chunks, axis=0)
  state = _standardize(state)
  w = params.frame_mlp
  state = jax.nn.relu(state @ w[0])
  state = state + _standardize(jax.nn.relu(state @ w[1])) @ w[2]
  state = state + _standardize(jax.nn.relu(state @ w[3])) @ w[4]
  return state * 0.01  # [T, 128]


def _predict(params, pts, vis, sequence_boundaries, fourdof):
  """Returns per-variant (pos_pred [N, K, 3], pred_mat [T, K, 3, 4])."""
  point_state = _point_features(params, pts, vis)  # [N, 64]
  frame_state = _frame_features(params, sequence_boundaries)  # [T, 128]

  n = pts.shape[0]

  def points_for(bank):
    mat = bank.reshape(n, 64, 3, -1)  # [N, 64, 3, K]
    return jnp.einsum("niok,ni->nko", mat, point_state) * 0.01

  def mats_for(bank):
    return make_projection_matrix(frame_state @ bank, fourdof)

  return (
      (points_for(params.cat_pred_base), mats_for(params.mat_pred_base)),
      (points_for(params.cat_pred_fork1), mats_for(params.mat_pred_fork1)),
      (points_for(params.cat_pred_fork2), mats_for(params.mat_pred_fork2)),
  )


def get_err(pts, vis, pred_xy):
  """Summed-over-frames squared reprojection error, [N, K]."""
  diff = pts[:, :, None, :] - pred_xy
  return jnp.sum(
      jnp.sum(jnp.square(diff), -1) * vis[:, :, None], axis=1
  )


def assignment_loss(err_summed, sum_vis, use_em, em_variance=1e-4):
  """Min-over-clusters (hard) or EM soft-assignment negative log-likelihood."""
  if not use_em:
    return jnp.sum(jnp.min(err_summed, axis=1)) / sum_vis
  err_n = err_summed - jnp.min(err_summed, axis=1, keepdims=True)
  err_exp = jnp.exp(-err_n / em_variance)
  wts = jnp.full((1, err_exp.shape[1]), 1.0 / err_exp.shape[1])
  for _ in range(3):
    w = err_exp * wts / jnp.sum(err_exp * wts, axis=1, keepdims=True)
    wts = jnp.maximum(w.sum(0, keepdims=True), 1e-8)
    wts = wts / wts.sum()
  ll = jax.scipy.special.logsumexp(-err_summed / em_variance, b=wts, axis=1)
  return -jnp.sum(ll) / sum_vis * em_variance


def _splice(base, fork1, fork2, i, chunk=1):
  """Candidate split: cluster i replaced by its fork1/fork2 copies."""
  return jnp.concatenate(
      [
          base[..., : i * chunk],
          fork1[..., i * chunk : (i + 1) * chunk],
          fork2[..., i * chunk : (i + 1) * chunk],
          base[..., (i + 1) * chunk :],
      ],
      axis=-1,
  )


def _drop(base, i, chunk=1):
  return jnp.concatenate(
      [base[..., : i * chunk], base[..., (i + 1) * chunk :]], axis=-1
  )


def loss_fn(
    params: ClusterParams,
    pts,
    vis,
    rng,
    num_cats: int,
    delete_mode: bool,
    sequence_boundaries,
    final_num_cats: int,
    use_em: bool,
    fourdof: bool,
    cam_focal_length: float,
    point_sample: int = 2048,
    frame_sample: int = 1024,
):
  """Split/delete search loss (reference: tapir_clustering.py:257-334)."""
  k1, k2, k3 = jax.random.split(rng, 3)
  pts_idx = jax.random.permutation(k1, pts.shape[0])[:point_sample]
  fr_idx = jax.random.permutation(k2, pts.shape[1])[:frame_sample]

  (base_p, base_m), (f1_p, f1_m), (f2_p, f2_m) = _predict(
      params, pts, vis, sequence_boundaries, fourdof
  )
  base_p, f1_p, f2_p = base_p[pts_idx], f1_p[pts_idx], f2_p[pts_idx]
  base_m, f1_m, f2_m = base_m[fr_idx], f1_m[fr_idx], f2_m[fr_idx]

  pts_s = pts[pts_idx][:, fr_idx]
  vis_s = vis[pts_idx][:, fr_idx]
  sum_vis = jnp.sum(vis_s)

  losses = []
  if delete_mode:
    pred, _ = project(base_m, base_p, cam_focal_length, k3)
    err = get_err(pts_s, vis_s, pred)
    for i in range(num_cats):
      losses.append(
          assignment_loss(_drop(err, i), sum_vis, use_em=use_em)
      )
    losses = jnp.array(losses)
    k = min(num_cats, num_cats - final_num_cats + 3)
    topk, _ = jax.lax.top_k(-losses, k)
    return jnp.mean(-topk), losses
  else:
    errs = []
    for p, m in ((base_p, base_m), (f1_p, f1_m), (f2_p, f2_m)):
      pred, _ = project(m, p, cam_focal_length, k3)
      errs.append(get_err(pts_s, vis_s, pred))
    for i in range(num_cats):
      err_i = _splice(errs[0], errs[1], errs[2], i)
      losses.append(assignment_loss(err_i, sum_vis, use_em=use_em))
    losses = jnp.array(losses)
    return jnp.min(losses), losses


def _surgery_split(params: ClusterParams, i: int, rng) -> ClusterParams:
  """Apply the chosen split: base cluster i <- fork1_i, append fork2_i."""
  rngs = jax.random.split(rng, 6)

  def fork(base, f1, f2, chunk, key_pair):
    base = np.asarray(base).copy()
    f1 = np.asarray(f1).copy()
    f2 = np.asarray(f2).copy()
    lb, ub = i * chunk, (i + 1) * chunk
    base[:, lb:ub] = f1[:, lb:ub]
    base = np.concatenate([base, f2[:, lb:ub]], axis=-1)
    noise = 1e-6

    def reinit(k):
      return base + np.asarray(
          jax.random.normal(k, base.shape)
      ) * noise

    return base, reinit(key_pair[0]), reinit(key_pair[1])

  cpb, cpf1, cpf2 = fork(
      params.cat_pred_base, params.cat_pred_fork1, params.cat_pred_fork2,
      1, rngs[0:2],
  )
  mpb, mpf1, mpf2 = fork(
      params.mat_pred_base, params.mat_pred_fork1, params.mat_pred_fork2,
      12, rngs[2:4],
  )
  return params._replace(
      cat_pred_base=jnp.asarray(cpb),
      cat_pred_fork1=jnp.asarray(cpf1),
      cat_pred_fork2=jnp.asarray(cpf2),
      mat_pred_base=jnp.asarray(mpb),
      mat_pred_fork1=jnp.asarray(mpf1),
      mat_pred_fork2=jnp.asarray(mpf2),
  )


def _surgery_delete(params: ClusterParams, i: int) -> ClusterParams:
  def drop(v, chunk):
    v = np.asarray(v)
    return jnp.asarray(
        np.concatenate(
            [v[:, : i * chunk], v[:, (i + 1) * chunk :]], axis=-1
        )
    )

  return params._replace(
      cat_pred_base=drop(params.cat_pred_base, 1),
      cat_pred_fork1=drop(params.cat_pred_fork1, 1),
      cat_pred_fork2=drop(params.cat_pred_fork2, 1),
      mat_pred_base=drop(params.mat_pred_base, 12),
      mat_pred_fork1=drop(params.mat_pred_fork1, 12),
      mat_pred_fork2=drop(params.mat_pred_fork2, 12),
  )


def compute_clusters(
    separation_tracks_dict: Mapping[str, np.ndarray],
    separation_visibility_dict: Mapping[str, np.ndarray],
    demo_episode_ids: Sequence[str],
    separation_video_shapes: Mapping[str, Sequence[int]],
    query_features=None,
    final_num_cats: int = 15,
    max_num_cats: int = 25,
    low_visibility_threshold: float = 0.1,
    use_em: bool = False,
    fourdof: bool = True,
    cam_focal_length: float = 1.0,
    iters_before_split: int = 500,
    point_sample: int = 2048,
    frame_sample: int = 1024,
    verbose: bool = True,
) -> Dict[str, np.ndarray]:
  """End-to-end clustering over (possibly multiple) episodes of tracks.

  Returns a dict with "classes" (argmin-error cluster per point) and
  "sum_error" alongside the filtered inputs.
  """
  tracks = np.concatenate(
      [separation_tracks_dict[k] for k in demo_episode_ids], axis=1
  )
  visibility = np.concatenate(
      [separation_visibility_dict[k] for k in demo_episode_ids], axis=1
  )
  enough = visibility.mean(-1) > low_visibility_threshold
  tracks, visibility = tracks[enough], visibility[enough]
  separation_tracks_dict = {
      k: v[enough] for k, v in separation_tracks_dict.items()
  }
  separation_visibility_dict = {
      k: v[enough] for k, v in separation_visibility_dict.items()
  }
  if query_features is not None:
    query_features = jax.tree_util.tree_map(
        lambda x: x[:, enough] if np.prod(x.shape) > 0 else x,
        query_features,
    )

  boundaries, cur = [], 0
  for k in demo_episode_ids:
    t = separation_video_shapes[k][0]
    boundaries.append((cur, cur + t))
    cur += t
  boundaries = tuple(boundaries)

  shp = separation_video_shapes[demo_episode_ids[0]]
  pts = jnp.asarray(tracks / np.array([shp[2], shp[1]]))
  vis = jnp.asarray(visibility)

  optimiser = optax.chain(
      optax.clip_by_global_norm(1e-3), optax.adam(5e-2, b1=0.9, b2=0.99)
  )
  rng = jax.random.PRNGKey(42)
  rng, init_rng = jax.random.split(rng)
  params = init_params(init_rng, pts, vis, num_cats=1)
  state = ClusterState(
      params, optimiser.init(params), rng, jnp.zeros((), jnp.int32)
  )

  num_iters = (
      max_num_cats + (max_num_cats - final_num_cats) - 1
  ) * iters_before_split
  num_cats = 1
  delete_mode = False
  loss_ma = 0.0
  num_since_fork = 0
  update_jit = None

  def make_update(num_cats, delete_mode):
    def update(state, lr_mul):
      rng, new_rng = jax.random.split(state.rng)
      (loss, losses), grads = jax.value_and_grad(
          loss_fn, has_aux=True
      )(
          state.params,
          pts,
          vis,
          rng,
          num_cats=num_cats,
          delete_mode=delete_mode,
          sequence_boundaries=boundaries,
          final_num_cats=final_num_cats,
          use_em=use_em,
          fourdof=fourdof,
          cam_focal_length=cam_focal_length,
          point_sample=min(point_sample, pts.shape[0]),
          frame_sample=min(frame_sample, pts.shape[1]),
      )
      updates, opt_state = optimiser.update(grads, state.opt_state)
      updates = jax.tree_util.tree_map(lambda u: u * lr_mul, updates)
      new_params = optax.apply_updates(state.params, updates)
      return (
          ClusterState(new_params, opt_state, new_rng, state.step + 1),
          loss,
          losses,
      )

    return jax.jit(update)

  for step in range(num_iters):
    if step % iters_before_split == iters_before_split - 1:
      if delete_mode:
        num_cats -= 1
        target = int(np.argmin(loss_ma))
        if verbose:
          print(f"deleting {target}; num_cats={num_cats}")
        params = _surgery_delete(state.params, target)
        if num_cats <= final_num_cats:
          # Done deleting; finish with plain (split-mode) optimization.
          delete_mode = False
      else:
        num_cats += 1
        target = int(np.argmin(loss_ma))
        if verbose:
          print(f"splitting {target}; num_cats={num_cats}")
        rng, k = jax.random.split(state.rng)
        params = _surgery_split(state.params, target, k)
        delete_mode = num_cats == max_num_cats
      state = ClusterState(
          params, optimiser.init(params), state.rng, state.step
      )
      loss_ma = 0.0
      num_since_fork = 0
      update_jit = None
    if update_jit is None:
      update_jit = make_update(num_cats, delete_mode)

    lr_mul = min(1.0, (num_since_fork + 1) / 20.0)
    frac = int(state.step) / max(num_iters, 1)
    lr_mul *= 0.5 ** sum(frac > f for f in (0.25, 0.5, 0.75))
    state, loss, losses = update_jit(state, lr_mul)
    loss_ma = 0.9 * loss_ma + 0.1 * np.asarray(losses)
    num_since_fork += 1
    if verbose and step % 100 == 0:
      print(f"step {step} loss {float(loss):.6f} num_cats {num_cats}")

  # Final hard assignment by total reprojection error.
  @jax.jit
  def eval_errors(params, rng):
    (pos, mats), _, _ = _predict(
        params, pts, vis, boundaries, fourdof
    )
    pred, _ = project(mats, pos, cam_focal_length, rng)
    diff = pts[:, :, None, :] - pred
    return jnp.sum(
        jnp.sum(jnp.square(diff), -1) * vis[:, :, None], axis=1
    )

  sum_error = np.asarray(eval_errors(state.params, jax.random.PRNGKey(0)))
  return {
      "classes": np.argmin(sum_error, axis=-1),
      "sum_error": sum_error,
      "separation_visibility": separation_visibility_dict,
      "separation_tracks": separation_tracks_dict,
      "query_features": query_features,
      "demo_episode_ids": list(demo_episode_ids),
  }
