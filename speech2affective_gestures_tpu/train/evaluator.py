"""Embedding-space evaluation: Fréchet Gesture Distance and friends.

Capability parity with reference `net/embedding_space_evaluator.py` +
`Processor.push_samples` (processor_v2.py:732-774):

- a frozen EmbeddingNet(mode='pose') embeds real & generated 34-frame
  sequences to 32-d; FGD = Fréchet distance between Gaussian fits (stable
  scipy sqrtm), feat_dist = mean per-pair L1; reconstruction-error diff;
- joint MAE after dir-vec -> pose FK, and acceleration difference (2nd
  temporal diff).

The embedding forward runs jitted on device for the whole pushed batch; the
Gaussian statistics / sqrtm run host-side in numpy (tiny, O(32^3)).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from scipy import linalg

from .. import constants as C
from ..models.embedding_net import EmbeddingNet
from ..ops import pose as pose_ops
from .losses import AverageMeter


class EmbeddingSpaceEvaluator:
    """FGD scorer around a frozen gesture autoencoder."""

    def __init__(self, variables, pose_dim: int = C.POSE_DIM,
                 n_frames: int = C.N_POSES, n_pre_poses: int = C.N_PRE_POSES):
        self.net = EmbeddingNet(pose_dim=pose_dim, n_frames=n_frames, mode="pose")
        self.variables = variables
        self.n_pre_poses = n_pre_poses
        self._embed = jax.jit(self._embed_fn)
        self.reset()

    @classmethod
    def from_torch_checkpoint(cls, path: str, **kw) -> "EmbeddingSpaceEvaluator":
        """Load the reference's frozen outputs/embedding_net.pth.tar
        (net/embedding_space_evaluator.py:20-27)."""
        from ..convert import torch_ckpt

        blob = torch_ckpt.load_pth_tar(path)
        params, stats = torch_ckpt.embedding_net_pose(blob["embedding_dict"])
        return cls({"params": params, "batch_stats": stats}, **kw)

    @classmethod
    def random_init(cls, rng_seed: int = 0, **kw) -> "EmbeddingSpaceEvaluator":
        """Fresh-initialized embedding net (for tests / smoke runs — scores
        are still well-defined, just not comparable to the paper's)."""
        net = EmbeddingNet(mode="pose")
        poses = jnp.zeros((2, C.N_POSES, C.POSE_DIM))
        variables = net.init(
            {"params": jax.random.key(rng_seed), "noise": jax.random.key(1)},
            None, None, poses[:, :4], poses,
        )
        return cls(variables, **kw)

    def _embed_fn(self, poses):
        # evaluation numerics must match the torch reference: force f32
        # matmuls (the TPU default is bf16-multiply, ~1e-2 drift per block)
        with jax.default_matmul_precision("highest"):
            _, _, _, feat, _, _, recon = self.net.apply(
                self.variables, None, None, poses[:, : self.n_pre_poses],
                poses, variational_encoding=False, train=False,
            )
        return feat, recon

    def reset(self):
        self.real_feat_list: list[np.ndarray] = []
        self.generated_feat_list: list[np.ndarray] = []
        self.recon_err_diff: list[float] = []

    def get_no_of_samples(self) -> int:
        return sum(len(f) for f in self.real_feat_list)

    def push_samples(self, generated_poses, real_poses):
        real_feat, real_recon = self._embed(jnp.asarray(real_poses))
        gen_feat, gen_recon = self._embed(jnp.asarray(generated_poses))
        self.real_feat_list.append(np.asarray(real_feat))
        self.generated_feat_list.append(np.asarray(gen_feat))
        err_real = float(jnp.mean(jnp.abs(jnp.asarray(real_poses) - real_recon)))
        err_fake = float(jnp.mean(jnp.abs(jnp.asarray(generated_poses) - gen_recon)))
        self.recon_err_diff.append(err_fake - err_real)

    def get_scores(self) -> tuple[float, float]:
        generated = np.vstack(self.generated_feat_list)
        real = np.vstack(self.real_feat_list)
        frechet_dist = self.frechet_distance(generated, real)
        feat_dist = float(np.mean(np.sum(np.abs(real - generated), axis=1)))
        return frechet_dist, feat_dist

    def get_features_for_viz(self) -> tuple[np.ndarray, np.ndarray]:
        """2-D projection of (real, generated) embedding features for
        visualization (ref net/embedding_space_evaluator.py:63-72). Uses
        UMAP when installed (the reference's choice), PCA otherwise — the
        projection backend is a viz detail, not a metric."""
        generated = np.vstack(self.generated_feat_list)
        real = np.vstack(self.real_feat_list)
        both = np.vstack((generated, real))
        try:
            import umap

            transformed = umap.UMAP().fit_transform(both)
        except ImportError:
            from sklearn.decomposition import PCA

            transformed = PCA(n_components=2).fit_transform(both)
        n = transformed.shape[0] // 2
        return transformed[n:], transformed[:n]  # (real, generated)

    def draw_embedding_space(self, output_path: str):
        """Scatter plot of the 2-D embedding space (real vs generated)."""
        import matplotlib

        matplotlib.use("Agg", force=False)
        import matplotlib.pyplot as plt

        real2d, gen2d = self.get_features_for_viz()
        fig, ax = plt.subplots(figsize=(6, 6))
        ax.scatter(real2d[:, 0], real2d[:, 1], s=6, alpha=0.5, label="real")
        ax.scatter(gen2d[:, 0], gen2d[:, 1], s=6, alpha=0.5, label="generated")
        ax.legend()
        ax.set_title("gesture embedding space")
        fig.savefig(output_path, dpi=120, bbox_inches="tight")
        plt.close(fig)
        return output_path

    @staticmethod
    def frechet_distance(samples_a: np.ndarray, samples_b: np.ndarray) -> float:
        mu_a, mu_b = samples_a.mean(0), samples_b.mean(0)
        cov_a = np.cov(samples_a, rowvar=False)
        cov_b = np.cov(samples_b, rowvar=False)
        try:
            return EmbeddingSpaceEvaluator.calculate_frechet_distance(
                mu_a, cov_a, mu_b, cov_b
            )
        except ValueError:
            return 1e10

    @staticmethod
    def calculate_frechet_distance(mu1, sigma1, mu2, sigma2, eps=1e-6) -> float:
        """Stable FID formula (ref net/embedding_space_evaluator.py:103-156)."""
        diff = mu1 - mu2
        cov_mean, _ = linalg.sqrtm(sigma1.dot(sigma2), disp=False)
        if not np.isfinite(cov_mean).all():
            offset = np.eye(sigma1.shape[0]) * eps
            cov_mean = linalg.sqrtm((sigma1 + offset).dot(sigma2 + offset))
        if np.iscomplexobj(cov_mean):
            if not np.allclose(np.diagonal(cov_mean).imag, 0, atol=1e-3):
                raise ValueError(
                    f"Imaginary component {np.max(np.abs(cov_mean.imag))}"
                )
            cov_mean = cov_mean.real
        return float(
            diff.dot(diff) + np.trace(sigma1) + np.trace(sigma2)
            - 2 * np.trace(cov_mean)
        )


def push_sample_metrics(
    target_dir_vec: np.ndarray,
    out_dir_vec: np.ndarray,
    mean_dir_vec: np.ndarray,
    losses_all: AverageMeter,
    joint_mae: AverageMeter,
    accel: AverageMeter,
    n_pre_poses: int = C.N_PRE_POSES,
    evaluator: EmbeddingSpaceEvaluator | None = None,
):
    """L1 + joint MAE (after FK) + accel diff, matching
    Processor.push_samples (processor_v2.py:737-774)."""
    batch_size = len(target_dir_vec)
    losses_all.update(float(np.mean(np.abs(out_dir_vec - target_dir_vec))),
                      batch_size)
    if evaluator is not None:
        evaluator.push_samples(out_dir_vec, target_dir_vec)

    mean = np.asarray(mean_dir_vec).reshape(-1)
    out_poses = np.asarray(
        pose_ops.convert_dir_vec_to_pose(jnp.asarray(out_dir_vec + mean))
    )
    target_poses = np.asarray(
        pose_ops.convert_dir_vec_to_pose(jnp.asarray(target_dir_vec + mean))
    )
    diff = out_poses[:, n_pre_poses:] - target_poses[:, n_pre_poses:]
    joint_mae.update(float(np.mean(np.abs(diff))), batch_size)
    target_acc = np.diff(target_poses, n=2, axis=1)
    out_acc = np.diff(out_poses, n=2, axis=1)
    accel.update(float(np.mean(np.abs(target_acc - out_acc))), batch_size)
    return losses_all, joint_mae, accel
