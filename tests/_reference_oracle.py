"""Load selected *importable* reference modules as behavioral oracles.

The upstream reference at /root/reference is read-only study material; a few
of its leaf modules are pure numpy/torch and import cleanly, so tests can use
them as ground truth for numerical parity without copying any code.
Everything else (librosa/lmdb-dependent modules) is exercised via golden
fixtures or independent re-derivations instead.
"""

import importlib.util
import pathlib
import sys

REFERENCE_ROOT = pathlib.Path("/root/reference")


def load(relpath: str, name: str):
    path = REFERENCE_ROOT / relpath
    if not path.exists():
        return None
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    try:
        spec.loader.exec_module(mod)
    except Exception:
        sys.modules.pop(name, None)
        return None
    return mod


def reference_graph():
    return load("net/utils/graph.py", "_ref_graph")


def reference_quaternions():
    return load("utils/Quaternions_torch.py", "_ref_quat")


def reference_tgcn():
    # net/utils/tgcn.py imports only torch
    return load("net/utils/tgcn.py", "_ref_tgcn")


def reference_tcn():
    return load("net/tcn.py", "_ref_tcn")


import contextlib


@contextlib.contextmanager
def _ephemeral_stubs(*names):
    """Install empty module stubs in sys.modules ONLY for the duration of a
    reference-module import (its globals keep their own binding afterwards).
    A LEAKED stub poisons our library's optional-dependency probes: `import
    umap`/`import fasttext` succeed on the empty shim and then
    AttributeError instead of taking the documented ImportError fallback —
    this bit the umap probe in train/evaluator.py (order-dependent
    test_round2_inventory failure)."""
    import types

    added = []
    for name in names:
        if name not in sys.modules:
            stub = types.ModuleType(name)
            if name == "umap":
                stub.UMAP = object  # class attribute referenced at import
            sys.modules[name] = stub
            added.append(name)
    if "librosa.feature" in names:
        sys.modules["librosa"].feature = sys.modules["librosa.feature"]
    try:
        yield
    finally:
        for name in added:
            sys.modules.pop(name, None)


def reference_v2_nets():
    """Import the reference's full v2 model file.

    It transitively imports librosa/fasttext (never called on the model
    path) and hard-codes `.cuda()` in AffEncoder init — stub the former,
    no-op the latter, and expose the package-style module names it expects.
    """
    import torch

    torch.Tensor.cuda = lambda self, *a, **k: self

    if str(REFERENCE_ROOT) not in sys.path:
        sys.path.insert(0, str(REFERENCE_ROOT))
    try:
        import importlib

        with _ephemeral_stubs("librosa", "librosa.feature", "fasttext"):
            return importlib.import_module("net.multimodal_context_net_v2")
    except Exception:
        return None


def reference_fgd_evaluator():
    """Import the reference's FGD scorer (net/embedding_space_evaluator.py)
    as a behavioral oracle for score COMPUTATION parity.

    Its import chain needs librosa/fasttext (stubbed, same as
    reference_v2_nets — never called on the scoring path) plus umap (only
    used by get_features_for_viz, also stubbed). The scoring methods
    (get_scores / calculate_frechet_distance, lines 74-156) touch only
    numpy + scipy.linalg, both installed."""
    if reference_v2_nets() is None:  # cuda no-op + sys.path setup
        return None
    try:
        import importlib

        with _ephemeral_stubs("librosa", "librosa.feature", "fasttext",
                              "umap"):
            return importlib.import_module("net.embedding_space_evaluator")
    except Exception:
        return None


def reference_abl_nets(which: str):
    """Import an ablation model file ('abl_audio' | 'abl_aff') with the same
    shims as reference_v2_nets."""
    if reference_v2_nets() is None:
        return None
    import importlib

    try:
        return importlib.import_module(
            f"net.multimodal_context_net_v2_{which}"
        )
    except Exception:
        return None
