"""Flat state-dict IO on numpy arrays.

The framework-neutral analogue of the reference's torch state utilities
(``/root/reference/modules/utils/state.py:17-95``): load/save ``.safetensors``
and ``.pt/.ckpt`` files as flat ``{dotted.name: np.ndarray}`` dicts, plus the
prefix-surgery and dtype-casting helpers every checkpoint tool uses.

All tensors live on host as numpy; bfloat16 uses ml_dtypes.
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Any, Optional, Union

import ml_dtypes
import numpy as np

State = dict[str, np.ndarray]

SUPPORTED_FORMATS = ["pt", "safetensors"]

DTYPE_MAP = {
    "fp16": np.float16,
    "fp32": np.float32,
    "bf16": ml_dtypes.bfloat16,
}


def infer_format(path: Union[str, Path]) -> Optional[str]:
    suffix = Path(path).suffix[1:].lower()
    if suffix in ("ckpt", "pt"):
        return "pt"
    if suffix == "safetensors":
        return "safetensors"
    return None


def infer_framework(state: State) -> str:
    """'ldm' if keys look like a CompVis checkpoint, else 'df' (diffusers)."""
    return "ldm" if any("model.diffusion_model." in k for k in state) else "df"


def _torch_to_numpy(t) -> np.ndarray:
    import torch

    if t.dtype == torch.bfloat16:
        return t.detach().view(torch.uint16).cpu().numpy().view(ml_dtypes.bfloat16)
    return t.detach().cpu().numpy()


def _numpy_to_torch(a: np.ndarray):
    import torch

    if a.dtype == ml_dtypes.bfloat16:
        return torch.from_numpy(np.ascontiguousarray(a).view(np.uint16)).view(torch.bfloat16)
    return torch.from_numpy(np.ascontiguousarray(a))


def load_state_dict(path: Union[str, Path], _format: Optional[str] = None) -> State:
    path = Path(path)
    if _format is None:
        _format = infer_format(path)
    if _format not in SUPPORTED_FORMATS:
        raise ValueError(f"Unsupported state format for {path}")

    if _format == "pt":
        import torch

        state = torch.load(path, map_location="cpu", weights_only=False)
        state = state.get("state_dict", state)
        return {
            k: _torch_to_numpy(v)
            for k, v in state.items()
            if hasattr(v, "detach")
        }

    from safetensors import safe_open

    state: State = {}
    with safe_open(str(path), framework="numpy") as f:
        for k in f.keys():
            state[k] = f.get_tensor(k)
    return state


def load_metadata(path: Union[str, Path]) -> Optional[dict[str, str]]:
    from safetensors import safe_open

    with safe_open(str(path), framework="numpy") as f:
        return f.metadata()


def save_state_dict(state: State, path: Union[str, Path], _format: Optional[str] = None,
                    metadata: Optional[dict[str, str]] = None):
    path = Path(path)
    if _format is None:
        _format = infer_format(path)
    if _format not in SUPPORTED_FORMATS:
        raise ValueError(f"Unsupported state format for {path}")

    if _format == "pt":
        import torch

        torch_state = {k: _numpy_to_torch(np.asarray(v)) for k, v in state.items()}
        with open(path, "wb") as f:
            torch.save({"state_dict": torch_state}, f)
        return

    from safetensors.numpy import save_file

    out = {k: np.ascontiguousarray(np.asarray(v)) for k, v in state.items()}
    save_file(out, str(path), metadata=metadata)


def where_prefix(state: State, prefix: str = "") -> State:
    return {k: v for k, v in state.items() if k.startswith(prefix)}


def replace_prefix(state: State, prefix: str = "", replacement: str = "") -> State:
    return {
        replacement + k[len(prefix):]: v
        for k, v in state.items()
        if k.startswith(prefix)
    }


def cast_type(state: State, dtype: Union[str, Any]) -> State:
    if isinstance(dtype, str):
        dtype = DTYPE_MAP[dtype]
    return {
        k: v.astype(dtype) if np.issubdtype(np.asarray(v).dtype, np.floating)
        or np.asarray(v).dtype == ml_dtypes.bfloat16 else v
        for k, v in state.items()
    }


def save_json_metadata(meta: dict) -> dict[str, str]:
    return {"json": json.dumps(meta)}
