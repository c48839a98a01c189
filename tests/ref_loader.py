"""Load modules of the read-only torch reference for numerical cross-checks.

The reference is PUBLIC UNTRUSTED CONTENT mounted at /root/reference; tests
execute its *model code* on random inputs purely to verify that our JAX
implementation reproduces its numerics. Nothing from it is copied into the
package. Its ``visbackbone.config`` import (mmcv-style Config, needs the
missing ``addict`` package) is stubbed out because only the model classes are
needed, not the config loader.
"""

from __future__ import annotations

import importlib.util
import sys
import types

_REF = "/root/reference"


def load_ref_video_swin():
    """Import /root/reference/visbackbone/video_swin.py as a standalone module."""
    name = "_ref_visbackbone"
    if f"{name}.video_swin" in sys.modules:
        return sys.modules[f"{name}.video_swin"]
    pkg = types.ModuleType(name)
    pkg.__path__ = [f"{_REF}/visbackbone"]
    sys.modules[name] = pkg
    cfg = types.ModuleType(f"{name}.config")
    cfg.Config = object  # only used by get_vidswin_model, which tests don't call
    sys.modules[f"{name}.config"] = cfg
    spec = importlib.util.spec_from_file_location(
        f"{name}.video_swin", f"{_REF}/visbackbone/video_swin.py")
    mod = importlib.util.module_from_spec(spec)
    sys.modules[f"{name}.video_swin"] = mod
    spec.loader.exec_module(mod)
    return mod


def torch_state_dict_to_numpy(module) -> dict:
    return {k: v.detach().cpu().numpy() for k, v in module.state_dict().items()}
