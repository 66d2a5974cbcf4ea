"""Checkpointing: orbax-backed full-train-state save/restore + torch converter.

The reference persists bare ``model.state_dict()`` pickles on best-Dice
improvement (`/root/reference/unetr_segmentation_3d.py:247-249`) or on a
schedule (`unetr_ranking_pretraining_3d.py:288-290`), loses optimizer state,
and resumes with ``global_step=0`` (seg `:613-615` — a quirk SURVEY.md §2.1
says not to copy). Here:

- orbax saves the FULL state (params, AdamW moments, step, PRNG key), so
  resume is exact;
- best-metric bookkeeping is kept in a sidecar JSON;
- ``convert_torch_state_dict`` maps a reference ``.pth`` state dict (MONAI 0.6
  module naming) onto the flax parameter tree, for weight-level parity runs
  and for consuming reference-pretrained encoders
  (`unetr_segmentation_3d.py:515-518`).
"""

from __future__ import annotations

import json
import os
import re
from typing import Any

import jax
import numpy as np


class CheckpointManager:
    """Minimal best/latest checkpoint manager over orbax StandardCheckpointer."""

    def __init__(self, directory: str, *, keep_best: bool = True) -> None:
        import orbax.checkpoint as ocp

        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self._ckpt = ocp.StandardCheckpointer()
        self.keep_best = keep_best

    def _meta_path(self) -> str:
        return os.path.join(self.directory, "meta.json")

    def save(
        self,
        state,
        *,
        metrics: dict[str, float] | None = None,
        name: str = "best",
        block: bool = False,
    ) -> str:
        """Save the full train state. Saves are ASYNC by default (orbax
        commits in a background thread; SURVEY.md §5 failure-recovery row) so
        scheduled ``save_latest_every`` saves never stall the step loop; pass
        ``block=True`` for final/handoff saves. Any still-running previous
        save is finalized first (orbax requirement; by then it has almost
        always completed)."""
        path = os.path.join(self.directory, name)
        tree = {
            "step": state.step,
            "params": state.params,
            "opt_state": state.opt_state,
            "rng": state.rng,
        }
        self._ckpt.wait_until_finished()  # finalize any in-flight save
        self._ckpt.save(path, tree, force=True)
        if block or name == "best":
            # Best saves commit before the meta.json sidecar is written, so a
            # crash mid-commit can never leave metadata pointing at a newer
            # best than the checkpoint on disk. Best saves are rare (on Dice
            # improvement); only scheduled "latest" saves stay fully async.
            self._ckpt.wait_until_finished()
        if name == "best":  # sidecar metadata tracks the best checkpoint only
            meta = {"step": int(state.step)}
            if metrics:
                meta.update({k: float(v) for k, v in metrics.items()})
            with open(self._meta_path(), "w") as f:
                json.dump(meta, f)
        return path

    def exists(self, name: str = "best") -> bool:
        self._ckpt.wait_until_finished()
        return os.path.isdir(os.path.join(self.directory, name))

    def wait(self) -> None:
        """Block until any in-flight async save has committed."""
        self._ckpt.wait_until_finished()

    def restore(self, state, *, name: str = "best"):
        """Restore into the structure of ``state`` (same model/optimizer)."""
        self._ckpt.wait_until_finished()  # never read a half-written save
        path = os.path.join(self.directory, name)
        template = {
            "step": state.step,
            "params": state.params,
            "opt_state": state.opt_state,
            "rng": state.rng,
        }
        tree = self._ckpt.restore(path, target=template)
        return state.replace(
            step=tree["step"],
            params=tree["params"],
            opt_state=tree["opt_state"],
            rng=tree["rng"],
        )

    def restore_freshest(self, state, *, prefer: str = "latest"):
        """Restore whichever of "latest"/"best" has the greater step.

        Elastic-recovery startup rule (SURVEY.md §5 failure-recovery row;
        the reference's crude original reloads best-so-far weights and
        resets the step, `unetr_segmentation_3d.py:612-615`): a scheduled
        "latest" save that is NEWER than the best checkpoint means the run
        crashed mid-interval — resume from it with full step/optimizer
        state instead of replaying from the older best. Ties go to
        ``prefer`` ("latest": identical steps mean the same state).
        """
        have = [n for n in ("best", "latest") if self.exists(n)]
        if not have:
            return state
        if len(have) == 1:
            return self.restore(state, name=have[0])
        restored = {n: self.restore(state, name=n) for n in have}
        steps = {n: int(restored[n].step) for n in have}
        if steps["latest"] == steps["best"]:
            return restored[prefer]
        return restored[max(steps, key=steps.get)]

    def metadata(self) -> dict:
        if not os.path.exists(self._meta_path()):
            return {}
        with open(self._meta_path()) as f:
            return json.load(f)


# ---------------------------------------------------------------------------
# torch (reference / MONAI 0.6) state_dict -> flax params
# ---------------------------------------------------------------------------

def _conv_kernel(w: np.ndarray) -> np.ndarray:
    # torch Conv3d (out, in, kd, kh, kw) -> flax (kd, kh, kw, in, out)
    return np.transpose(w, (2, 3, 4, 1, 0))


def _convt_kernel(w: np.ndarray) -> np.ndarray:
    # torch ConvTranspose3d (in, out, kd, kh, kw) -> flax transpose_kernel
    # layout (kd, kh, kw, out, in)
    return np.transpose(w, (2, 3, 4, 1, 0))


def _linear_kernel(w: np.ndarray) -> np.ndarray:
    return np.transpose(w)


def _set(tree: dict, path: tuple[str, ...], value: np.ndarray) -> None:
    node = tree
    for key in path[:-1]:
        node = node.setdefault(key, {})
    node[path[-1]] = value


def convert_torch_state_dict(state_dict: dict[str, Any]) -> dict:
    """Convert a reference UNETR ``state_dict()`` to a flax params dict.

    Handles the MONAI 0.6 module naming used by both the local variant
    (`/root/reference/unetr.py`) and the stock ``monai.networks.nets.UNETR``:
    ``vit.patch_embedding.patch_embeddings.1`` (perceptron Linear),
    ``vit.blocks.{i}.{norm1,attn.qkv,attn.out_proj,norm2,mlp.linear1,mlp.linear2}``,
    ``encoder1.layer.{convN,normN}``, ``encoder{2,3,4}.{transp_conv_init,blocks.N}``,
    ``decoder{5,4,3,2}.{transp_conv,conv_block.*}``, ``out.conv``.
    Missing biases (MONAI convs are frequently bias-less) are left absent —
    merge with a zero-initialized tree via `merge_params`.
    """
    params: dict = {}
    for key, value in state_dict.items():
        v = np.asarray(value.detach().cpu().numpy() if hasattr(value, "detach") else value)
        path_value = _convert_key(key, v)
        if path_value is None:
            raise KeyError(f"unrecognized reference checkpoint key: {key}")
        path, val = path_value
        _set(params, path, val)
    return {"params": params}


def _convert_key(key: str, v: np.ndarray):
    # --- ViT ---
    m = re.fullmatch(r"vit\.patch_embedding\.patch_embeddings\.1\.(weight|bias)", key)
    if m:
        name = "kernel" if m.group(1) == "weight" else "bias"
        val = _linear_kernel(v) if name == "kernel" else v
        return ("vit", "patch_embedding", "proj", name), val
    m = re.fullmatch(r"vit\.patch_embedding\.patch_embeddings\.(weight|bias)", key)
    if m:
        # pos_embed="conv": MONAI's patch_embeddings is a bare Conv3d
        name = "kernel" if m.group(1) == "weight" else "bias"
        val = _conv_kernel(v) if name == "kernel" else v
        return ("vit", "patch_embedding", "proj_conv", name), val
    if key == "vit.patch_embedding.position_embeddings":
        return ("vit", "patch_embedding", "pos_embedding"), v
    m = re.fullmatch(r"vit\.blocks\.(\d+)\.norm([12])\.(weight|bias)", key)
    if m:
        name = "scale" if m.group(3) == "weight" else "bias"
        return ("vit", f"block_{m.group(1)}", f"norm{m.group(2)}", name), v
    m = re.fullmatch(r"vit\.blocks\.(\d+)\.attn\.qkv\.weight", key)
    if m:
        return ("vit", f"block_{m.group(1)}", "attn", "qkv", "kernel"), _linear_kernel(v)
    m = re.fullmatch(r"vit\.blocks\.(\d+)\.attn\.out_proj\.(weight|bias)", key)
    if m:
        name = "kernel" if m.group(2) == "weight" else "bias"
        val = _linear_kernel(v) if name == "kernel" else v
        return ("vit", f"block_{m.group(1)}", "attn", "out_proj", name), val
    m = re.fullmatch(r"vit\.blocks\.(\d+)\.mlp\.linear([12])\.(weight|bias)", key)
    if m:
        name = "kernel" if m.group(3) == "weight" else "bias"
        val = _linear_kernel(v) if name == "kernel" else v
        return ("vit", f"block_{m.group(1)}", "mlp", f"fc{m.group(2)}", name), val
    m = re.fullmatch(r"vit\.norm\.(weight|bias)", key)
    if m:
        name = "scale" if m.group(1) == "weight" else "bias"
        return ("vit", "norm", name), v
    # --- encoder1 (UnetrBasicBlock -> UnetResBlock) ---
    m = re.fullmatch(r"encoder1\.layer\.conv([123])\.conv\.(weight|bias)", key)
    if m:
        name = "kernel" if m.group(2) == "weight" else "bias"
        val = _conv_kernel(v) if name == "kernel" else v
        return ("encoder1", "layer", f"conv{m.group(1)}", "conv", name), val
    m = re.fullmatch(r"encoder1\.layer\.norm([123])\.(weight|bias)", key)
    if m:
        name = "scale" if m.group(2) == "weight" else "bias"
        return ("encoder1", "layer", f"norm{m.group(1)}", name), v
    # --- encoders 2-4 (UnetrPrUpBlock, transpose convs only) ---
    m = re.fullmatch(r"encoder([234])\.transp_conv_init\.conv\.(weight|bias)", key)
    if m:
        name = "kernel" if m.group(2) == "weight" else "bias"
        val = _convt_kernel(v) if name == "kernel" else v
        return (f"encoder{m.group(1)}", "transp_conv_init", "convt", name), val
    m = re.fullmatch(r"encoder([234])\.blocks\.(\d+)\.conv\.(weight|bias)", key)
    if m:
        name = "kernel" if m.group(3) == "weight" else "bias"
        val = _convt_kernel(v) if name == "kernel" else v
        return (f"encoder{m.group(1)}", f"transp_{m.group(2)}", "convt", name), val
    # --- decoders (UnetrUpBlock) ---
    m = re.fullmatch(r"decoder([2345])\.transp_conv\.conv\.(weight|bias)", key)
    if m:
        name = "kernel" if m.group(2) == "weight" else "bias"
        val = _convt_kernel(v) if name == "kernel" else v
        return (f"decoder{m.group(1)}", "transp_conv", "convt", name), val
    m = re.fullmatch(r"decoder([2345])\.conv_block\.conv([123])\.conv\.(weight|bias)", key)
    if m:
        name = "kernel" if m.group(3) == "weight" else "bias"
        val = _conv_kernel(v) if name == "kernel" else v
        return (f"decoder{m.group(1)}", "conv_block", f"conv{m.group(2)}", "conv", name), val
    m = re.fullmatch(r"decoder([2345])\.conv_block\.norm([123])\.(weight|bias)", key)
    if m:
        name = "scale" if m.group(3) == "weight" else "bias"
        return (f"decoder{m.group(1)}", "conv_block", f"norm{m.group(2)}", name), v
    # --- out head ---
    m = re.fullmatch(r"out\.conv\.conv\.(weight|bias)", key)
    if m:
        name = "kernel" if m.group(1) == "weight" else "bias"
        val = _conv_kernel(v) if name == "kernel" else v
        return ("out", "conv", name), val
    return None


def merge_params(template: dict, converted: dict) -> dict:
    """Overlay converted weights on a zero/init template, keeping template
    leaves where the checkpoint had none (e.g. bias-less MONAI convs)."""

    def merge(t, c):
        if isinstance(t, dict):
            out = {}
            for k, v in t.items():
                out[k] = merge(v, c.get(k)) if isinstance(c, dict) else v
            return out
        if c is None:
            return t
        c = np.asarray(c)
        if tuple(t.shape) != tuple(c.shape):
            raise ValueError(f"shape mismatch: template {t.shape} vs checkpoint {c.shape}")
        return c.astype(np.asarray(t).dtype)

    return merge(template, converted)


def load_torch_checkpoint(path: str, template_params: dict) -> dict:
    """Load a reference ``.pth`` and merge onto ``template_params``
    (reference load at `unetr_segmentation_3d.py:515-518`)."""
    import torch

    state_dict = torch.load(path, map_location="cpu")
    converted = convert_torch_state_dict(state_dict)
    return merge_params(template_params, converted)
