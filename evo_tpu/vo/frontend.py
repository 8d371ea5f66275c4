"""Visual-odometry front end: keyframe policy, localization, mapping, BA.

Capability counterpart of `VisualOdometryFrontEnd`
(`implementation/visual_odometry/src/visual_odometry.cpp`), with the same
policy, device-solved math:

- keyframe admission (`isNewKeyframeNeeded`, :106-154): frame 0 = identity;
  frame 1 = 2D-2D bootstrap (8-point RANSAC over shared-track bearings with
  unit-norm translation, `initCameras`/`findInliersRansac`, :176-210,288-341);
  later frames = 2D-3D localization (P3P RANSAC + nonlinear refinement +
  inlier reselection, `localizeCamera`, :212-286), accept when inliers >
  numOfInliers, else try re-bootstrap, else reuse the last pose for up to
  maxNumWithoutAdd frames;
- map maintenance: evict the oldest keyframe beyond the 20-frame window
  (`deleteKeyframe`, :165-174), archive landmarks losing their last
  observation (`deleteLandmarks`, :379-414), triangulate each track on its
  2nd observation (`addNewLandmarks`, :343-377);
- windowed BA after every accepted keyframe (`optimize`, :416-497 — see
  evo_tpu.vo.ba);
- GT sync by SE(3) interpolation (`syncGtAndImage`, :522-561) and live
  Sim(3)-aligned ATE logging (:78-97).

Padded-array packing keeps device shapes static (power-of-two buckets), so
the policy's data-dependent sizes never trigger unbounded recompiles.
"""

from __future__ import annotations

import contextlib
import dataclasses
import logging

import jax
import jax.numpy as jnp
import numpy as np

from evo_tpu.core import camera, lie
from evo_tpu.solve import ransac, triangulate
from evo_tpu.vo import ba
from evo_tpu.vo.align_sim3 import ErrorMetric, align_trajectories_sim3
from evo_tpu.vo.keyframe import Keyframe, MapLandmarks, Match

_log = logging.getLogger(__name__)


@dataclasses.dataclass
class VoParams:
    """Mirror of `VisualOdometryParams` (visual_odometry.h:27-38)."""

    num_active_frames: int = 20
    num_inliers: int = 55
    ransac_min_inliers: int = 15
    max_iterations: int = 50
    max_num_without_add: int = 4
    ransac_threshold: float = 5e-5
    reprojection_error_px: float = 3.0
    huber_loss: float = 0.8
    num_bootstrap_hypotheses: int = 256
    num_localize_hypotheses: int = 128
    # compensated (two-float Kahan) assembly of the BA normal-equation
    # blocks — depth-independent f32 accumulation error on long windows
    # (solve.precision; SURVEY §7 hard part 6)
    ba_compensated: bool = False
    # BA function tolerance (Ceres function_tolerance analogue): an accepted
    # LM step whose relative cost decrease falls below it ends the solve.
    # 1e-5 cuts ~1/3 of the iterations vs Ceres' 1e-6 default with no
    # measured ATE change on the quality suite (QUALITY.json ba_tol_ab)
    ba_tol: float = 1e-5
    # robustness gates the reference lacks (its triangulation accepts any
    # depth, visual_odometry.cpp:343-377 — fine on its short well-conditioned
    # sequences; on long runs one near-parallel triangulation at ~1e6 m
    # poisons the map and the localization that follows). Units: the
    # map/bootstrap scale (bootstrap translation is unit length).
    max_landmark_depth: float = 1e3
    max_pose_translation: float = 1e3
    # "cpu": run the VO geometry (RANSAC, triangulation, BA, Sim3) on the
    # host CPU jax backend. These solves are tiny (≤20 poses, hundreds of
    # landmarks) and dispatch-latency-bound: on a remote-attached TPU every
    # call pays a ~45 ms tunnel round trip, so the policy loop would spend
    # its time in transit, not math. The throughput kernels (splat, patch
    # alignment, contrast-max) stay on the TPU. "default": session device.
    geometry_backend: str = "cpu"


def _bucket(n: int, lo: int = 16) -> int:
    b = lo
    while b < n:
        b *= 2
    return b


def _pad2(arr: np.ndarray, size: int) -> jnp.ndarray:
    out = np.zeros((size,) + arr.shape[1:], np.float32)
    out[: len(arr)] = arr
    return jnp.asarray(out)


@jax.jit
def _unproject_jit(intr, pix):
    return camera.unproject(intr, pix)


@jax.jit
def _triangulate_pix(intr, p1, p2, pose_w_1, pose_w_2):
    """Unproject two padded pixel sets and midpoint-triangulate them into the
    world frame in a single device call (visual_odometry.cpp:343-377)."""
    f1 = camera.unproject(intr, p1)
    f2 = camera.unproject(intr, p2)
    p_w, _ = triangulate.triangulate_landmarks(f1, f2, pose_w_1, pose_w_2)
    return p_w


@jax.jit
def _sim3_inv_mul_se3_batch(sim, gs):
    """sim3_inverse + batched Sim3·SE3 in ONE jit: the inverse ran eagerly
    before, and on this host every eager jnp op dispatches a ~1 ms
    micro-program — 14 keyframes of eager sim3_inverse cost 0.27 s of the
    bench pipeline (cProfile)."""
    sim_inv = lie.sim3_inverse(sim)
    return jax.vmap(lie.sim3_mul_se3, in_axes=(None, 0))(sim_inv, gs)


@jax.jit
def _rel_to_first(zero_gt, gt):
    """T_0⁻¹·T_gt in one jit (eager per-keyframe lie calls are dispatch-
    latency-bound, see _sim3_inv_mul_se3_batch)."""
    return lie.se3_compose(lie.se3_inverse(zero_gt), gt)


@jax.jit
def _se3_compose_jit(a, b):
    return lie.se3_compose(a, b)


class VisualOdometryFrontEnd:
    def __init__(self, calib, params: VoParams | None = None, seed: int = 0):
        self.params = params or VoParams()
        self.calib = calib
        self._geom_device = None
        if self.params.geometry_backend == "cpu":
            try:
                self._geom_device = jax.local_devices(backend="cpu")[0]
            except RuntimeError:
                self._geom_device = None
        with self._on_geom_device():
            self.intr = jnp.asarray(calib.to_array())
        self.active_frames: dict[int, Keyframe] = {}  # t_us -> Keyframe
        self.stored_frames: list[Keyframe] = []
        self.map = MapLandmarks()
        self.stored_landmarks: list[tuple[int, np.ndarray]] = []
        self.without_add = 0
        self.gt_t_us = np.zeros(0, np.int64)
        self.gt_poses = np.zeros((0, 7))
        self.gt_list: list[np.ndarray] = []
        self.gt_aligned: list[np.ndarray] = []
        self.zero_gt: np.ndarray | None = None
        self.last_ate: ErrorMetric | None = None
        with self._on_geom_device():
            self._key = jax.random.PRNGKey(seed)

    # ------------------------------------------------------------------
    def _on_geom_device(self):
        """Context routing the frontend's small-geometry jax calls to the
        host CPU backend (see VoParams.geometry_backend)."""
        if self._geom_device is None:
            return contextlib.nullcontext()
        return jax.default_device(self._geom_device)

    def set_ground_truth(self, t_us: np.ndarray, poses: np.ndarray) -> None:
        self.gt_t_us = t_us
        self.gt_poses = poses

    def _next_key(self):
        self._key, k = jax.random.split(self._key)
        return k

    def _unproject(self, pix: np.ndarray) -> np.ndarray:
        return np.asarray(_unproject_jit(self.intr, jnp.asarray(pix, jnp.float32)))

    # -- policy ---------------------------------------------------------
    def new_keyframe_candidate(self, keyframe: Keyframe) -> bool:
        with self._on_geom_device():
            return self._new_keyframe_candidate(keyframe)

    def _new_keyframe_candidate(self, keyframe: Keyframe) -> bool:
        match = Match()
        if not self._is_new_keyframe_needed(keyframe, match):
            self.without_add += 1
            return False

        gt = self._sync_gt(keyframe.t_us)
        if gt is not None:
            if not self.gt_list:
                self.zero_gt = gt
            rel = np.asarray(
                _rel_to_first(jnp.asarray(self.zero_gt), jnp.asarray(gt))
            )
            self.gt_list.append(rel)
            self.gt_aligned.append(rel)

        self._delete_keyframe()
        self._add_keyframe(keyframe, match)
        self._optimize()

        poses = [kf.pose for kf in self.stored_frames] + [
            self.active_frames[t].pose for t in sorted(self.active_frames)
        ]
        if len(poses) > 5 and self.gt_list:
            sim, ate = align_trajectories_sim3(self.gt_list, poses)
            self.last_ate = ate
            n = len(self.gt_list)
            gs = np.zeros((_bucket(n), 7), np.float32)
            gs[:, 0] = 1.0  # identity-pose padding keeps the math NaN-free
            gs[:n] = self.gt_list
            aligned = np.asarray(
                _sim3_inv_mul_se3_batch(jnp.asarray(sim, jnp.float32), jnp.asarray(gs))
            )[:n]
            self.gt_aligned = list(aligned.astype(np.float64))
            _log.info(
                "ATE rmse=%.4f mean=%.4f max=%.4f min=%.4f",
                ate.rmse, ate.mean, ate.max, ate.min,
            )
        _log.info(
            "keyframe @%d added; map has %d landmarks",
            keyframe.t_us, len(self.map.landmarks),
        )
        return True

    def _is_new_keyframe_needed(self, keyframe: Keyframe, match: Match) -> bool:
        if not self.active_frames:
            keyframe.pose = np.array([1.0, 0, 0, 0, 0, 0, 0])
            match.inliers = list(keyframe.landmarks)
            return True
        if len(self.active_frames) == 1:
            return self._init_cameras(keyframe, match)
        self._localize_camera(keyframe, match)
        keyframe.pose = match.pose.copy()
        if len(match.inliers) > self.params.num_inliers:
            return True
        if self._init_cameras(keyframe, match):
            return True
        if self.params.max_num_without_add > self.without_add:
            last_t = max(self.active_frames)
            match.pose = self.active_frames[last_t].pose.copy()
            keyframe.pose = match.pose.copy()
            match.inliers = list(keyframe.landmarks)
            return True
        _log.info("few inliers after localization: %d", len(match.inliers))
        return True

    # -- geometric stages ----------------------------------------------
    def _init_cameras(self, keyframe: Keyframe, match: Match) -> bool:
        """2D-2D bootstrap against the newest active keyframe."""
        last_t = max(self.active_frames)
        start = self.active_frames[last_t]
        shared = start.shared_tracks(keyframe)
        if len(shared) < 8:
            return False
        p1 = np.stack([start.landmarks[t] for t in shared])
        p2 = np.stack([keyframe.landmarks[t] for t in shared])
        f1 = self._unproject(p1)
        f2 = self._unproject(p2)
        n = len(shared)
        b = _bucket(n)
        pose_rel, res = ransac.relative_pose_ransac(
            self._next_key(), _pad2(f1, b), _pad2(f2, b), jnp.asarray(n),
            num_hypotheses=self.params.num_bootstrap_hypotheses,
            threshold=self.params.ransac_threshold,
            valid_mask=jnp.arange(b) < n,
        )
        n_inl = int(res.num_inliers)
        _log.info("bootstrap with %d RANSAC inliers", n_inl)
        if n_inl < max(self.params.ransac_min_inliers, self.params.num_inliers):
            return False
        inl = np.asarray(res.inliers)[:n]
        match.inliers = [t for t, ok in zip(shared, inl) if ok]
        # T_w_new = T_w_last · T_rel (unit-norm translation fixes scale)
        keyframe.pose = np.asarray(
            _se3_compose_jit(jnp.asarray(start.pose, jnp.float32), pose_rel),
            np.float64,
        )
        match.pose = keyframe.pose.copy()
        return True

    def _localize_camera(self, keyframe: Keyframe, match: Match) -> None:
        """2D-3D localization against the current landmark map."""
        match.inliers = []
        tracks = [t for t in keyframe.landmarks if t in self.map.landmarks]
        if len(tracks) < 4:
            return
        pix = np.stack([keyframe.landmarks[t] for t in tracks])
        pts = np.stack([self.map.landmarks[t] for t in tracks])
        n = len(tracks)
        b = _bucket(n)
        threshold = 1.0 - np.cos(np.arctan2(self.params.reprojection_error_px, 200.0))
        # unproject + P3P RANSAC + refine + reselect in ONE dispatch
        # (:212-286); one packed pull for (pose, inliers)
        refined, inl_mask = ransac.localize_camera_fused(
            self._next_key(), self.intr, _pad2(pix, b), _pad2(pts, b),
            jnp.asarray(n), jnp.arange(b) < n, float(threshold),
            num_hypotheses=self.params.num_localize_hypotheses,
        )
        refined_np, inl = jax.device_get((refined, inl_mask))
        inl = inl[:n]
        pose_np = refined_np.astype(np.float64)
        # sanity gate: a localization teleporting the camera outside the
        # map's scale is a degenerate P3P fit, not a pose — treat as failed
        # (no reference analogue; see VoParams.max_pose_translation)
        if not np.all(np.isfinite(pose_np)) or (
            np.linalg.norm(pose_np[4:7]) > self.params.max_pose_translation
        ):
            _log.warning("localization rejected: |t|=%.3g",
                         float(np.linalg.norm(pose_np[4:7])))
            return
        match.pose = pose_np
        match.inliers = [t for t, ok in zip(tracks, inl) if ok]

    # -- map maintenance ------------------------------------------------
    def _add_keyframe(self, keyframe: Keyframe, match: Match) -> None:
        self.without_add = 0
        self.active_frames[keyframe.t_us] = keyframe
        self._add_new_landmarks(keyframe, match)

    def _delete_keyframe(self) -> None:
        if len(self.active_frames) > self.params.num_active_frames:
            oldest_t = min(self.active_frames)
            oldest = self.active_frames.pop(oldest_t)
            self.stored_frames.append(oldest)
            self._delete_landmarks(oldest)

    def _add_new_landmarks(self, keyframe: Keyframe, match: Match) -> None:
        """Observations for inliers; triangulate on the 2nd observation
        (visual_odometry.cpp:343-377). All of a keyframe's new landmarks
        sharing the same first-observation keyframe triangulate in ONE
        padded batch (one device call instead of 3 per track)."""
        pending: dict[int, list[int]] = {}
        for track in match.inliers:
            self.map.observations.setdefault(track, []).append(keyframe.t_us)
            obs = self.map.observations[track]
            if len(obs) == 2 and obs[0] in self.active_frames:
                if obs[1] in self.active_frames and track in keyframe.landmarks:
                    pending.setdefault(obs[0], []).append(track)
        for t1, tracks in pending.items():
            k1 = self.active_frames[t1]
            tracks = [t for t in tracks if t in k1.landmarks]
            if not tracks:
                continue
            n = len(tracks)
            b = _bucket(n)
            p1 = np.stack([k1.landmarks[t] for t in tracks])
            p2 = np.stack([keyframe.landmarks[t] for t in tracks])
            p_w = np.asarray(
                _triangulate_pix(
                    self.intr, _pad2(p1, b), _pad2(p2, b),
                    jnp.asarray(k1.pose, jnp.float32),
                    jnp.asarray(keyframe.pose, jnp.float32),
                ),
                np.float64,
            )
            # depth gate: near-parallel rays triangulate to ~1e6 and poison
            # the map (see VoParams.max_landmark_depth)
            dist = np.linalg.norm(p_w - keyframe.pose[4:7], axis=-1)
            for i, t in enumerate(tracks):
                if np.all(np.isfinite(p_w[i])) and (
                    dist[i] <= self.params.max_landmark_depth
                ):
                    self.map.landmarks[t] = p_w[i]

    def _delete_landmarks(self, keyframe: Keyframe) -> None:
        for track in keyframe.landmarks:
            obs = self.map.observations.get(track)
            if obs and keyframe.t_us in obs:
                obs.remove(keyframe.t_us)
        dead = [t for t, obs in self.map.observations.items() if not obs]
        for t in dead:
            if t in self.map.landmarks:
                self.stored_landmarks.append((t, self.map.landmarks.pop(t)))
            del self.map.observations[t]

    # -- BA --------------------------------------------------------------
    def _optimize(self) -> None:
        frames_t = sorted(self.active_frames)
        F = len(frames_t)
        if F < 3:
            return
        frame_idx = {t: i for i, t in enumerate(frames_t)}
        lm_ids = [
            t for t, obs in self.map.observations.items()
            if len(obs) >= 2 and t in self.map.landmarks
        ]
        if not lm_ids:
            return
        lm_idx = {t: i for i, t in enumerate(lm_ids)}
        obs_f, obs_l, obs_p = [], [], []
        for t in lm_ids:
            for kt in self.map.observations[t]:
                kf = self.active_frames.get(kt)
                if kf is None or t not in kf.landmarks:
                    continue
                obs_f.append(frame_idx[kt])
                obs_l.append(lm_idx[t])
                obs_p.append(kf.landmarks[t])
        O = len(obs_f)
        if O < 10:
            return
        Fb = self.params.num_active_frames + 1
        # landmarks pad to the next multiple of 64 (not the next power of
        # two): the dense Schur einsum is linear in padded L, and at the
        # pipeline's ~300-landmark windows the power-of-two bucket (512) was
        # paying 60% padding on the solve's dominant term
        Lb = 64 * max(1, -(-len(lm_ids) // 64))
        Ob = _bucket(O, 256)

        poses = np.zeros((Fb, 7), np.float32)
        poses[:, 0] = 1.0
        for t, i in frame_idx.items():
            poses[i] = self.active_frames[t].pose
        lms = np.zeros((Lb, 3), np.float32)
        for t, i in lm_idx.items():
            lms[i] = self.map.landmarks[t]
        of = np.zeros(Ob, np.int32)
        ol = np.zeros(Ob, np.int32)
        op = np.zeros((Ob, 2), np.float32)
        om = np.zeros(Ob, bool)
        of[:O] = obs_f
        ol[:O] = obs_l
        op[:O] = obs_p
        om[:O] = True
        fixed = np.zeros(Fb, bool)
        fixed[: min(2, F)] = True
        fixed[F:] = True  # padding frames pinned

        new_poses, new_lms, cost, cost0, ba_iters = ba.ba_solve(
            jnp.asarray(poses), jnp.asarray(lms), self.intr,
            jnp.asarray(of), jnp.asarray(ol), jnp.asarray(op), jnp.asarray(om),
            jnp.asarray(fixed),
            num_iters=self.params.max_iterations, huber=self.params.huber_loss,
            compensated=self.params.ba_compensated,
            tol=self.params.ba_tol,
        )
        new_poses = np.asarray(new_poses, np.float64)
        new_lms = np.asarray(new_lms, np.float64)
        # post-solve sanity gates (production guard, see VoParams.max_*): a
        # weakly constrained direction can let BA run a pose or landmark to
        # ~1e4-1e8 while still reducing the robust cost; such updates are
        # rejected (pose keeps its prior value, the landmark is archived) so
        # one degenerate window cannot poison the map for every later one.
        for t, i in frame_idx.items():
            p = new_poses[i]
            if np.all(np.isfinite(p)) and (
                np.linalg.norm(p[4:7]) <= self.params.max_pose_translation
            ):
                self.active_frames[t].pose = p
        newest_c = self.active_frames[frames_t[-1]].pose[4:7]
        for t, i in lm_idx.items():
            p = new_lms[i]
            if np.all(np.isfinite(p)) and (
                np.linalg.norm(p - newest_c) <= self.params.max_landmark_depth
            ):
                self.map.landmarks[t] = p
            else:
                self.stored_landmarks.append((t, self.map.landmarks.pop(t)))
                self.map.observations.pop(t, None)
        _log.info("BA: cost %.4f -> %.4f over %d obs, %d iters",
                  float(cost0), float(cost), O, int(ba_iters))

    # -- GT ---------------------------------------------------------------
    def _sync_gt(self, t_us: int):
        from evo_tpu.io.replay import interpolate_gt

        return interpolate_gt(self.gt_t_us, self.gt_poses, t_us)
