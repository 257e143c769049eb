"""Executable documentation tests.

The reference runs its usage guide as doctests (reference setup.cfg:42-45,
docs/usage.rst), so the docs break when the API does.  Equivalent here:

- docs/example.py (the full 11-step walkthrough) is executed end-to-end;
- every ``origin_tpu.*`` dotted reference and every ``stepNN_name`` method
  mentioned in docs/*.md and README.md must resolve against the package.
"""

import importlib
import os
import re
import sys

import numpy as np

DOCS = os.path.join(os.path.dirname(__file__), "..", "docs")
REPO = os.path.join(os.path.dirname(__file__), "..")


def test_example_walkthrough(tmp_path):
    """docs/example.py runs end-to-end and produces a session + catalog."""
    sys.path.insert(0, DOCS)
    try:
        import example
    finally:
        sys.path.remove(DOCS)

    orig = example.main(str(tmp_path))
    assert len(orig.Cat3_sources) >= 1
    outdir = tmp_path / "example"
    for fname in ("example.yaml", "Cat1.fits", "Cat3_lines.fits",
                  "Cat3_sources.fits"):
        assert (outdir / fname).exists(), fname
    assert (outdir / "sources").exists()
    for h in orig.logger.handlers:
        h.close()


def _doc_texts():
    texts = []
    for name in sorted(os.listdir(DOCS)):
        if name.endswith(".md"):
            with open(os.path.join(DOCS, name)) as f:
                texts.append((name, f.read()))
    with open(os.path.join(REPO, "README.md")) as f:
        texts.append(("README.md", f.read()))
    return texts


def _resolve(dotted):
    """Resolve a dotted origin_tpu reference via import + getattr."""
    parts = dotted.split(".")
    for split in range(len(parts), 0, -1):
        modname = ".".join(parts[:split])
        try:
            obj = importlib.import_module(modname)
        except ImportError:
            continue
        try:
            for attr in parts[split:]:
                obj = getattr(obj, attr)
        except AttributeError:
            return False
        return True
    return False


def test_docs_api_references_resolve():
    """Every origin_tpu.* dotted name in the docs must exist."""
    pattern = re.compile(r"\borigin_tpu(?:\.[A-Za-z_][A-Za-z0-9_]*)+")
    missing = []
    for name, text in _doc_texts():
        for ref in sorted(set(pattern.findall(text))):
            dotted = ref.rstrip(".")
            # file-path style references (origin_tpu/ops/...) don't match
            # the regex; method calls captured without parens resolve fine
            if not _resolve(dotted):
                missing.append(f"{name}: {dotted}")
    assert not missing, "dangling API references:\n" + "\n".join(missing)


def test_docs_step_methods_resolve():
    """Every stepNN_name mentioned in the docs must be a real step method."""
    from origin_tpu.pipeline.steps import STEPS

    real = {f"step{i:02d}_{cls.name}" for i, cls in enumerate(STEPS, 1)}
    pattern = re.compile(r"\bstep\d{2}_[A-Za-z_]\w*")
    missing = []
    for name, text in _doc_texts():
        for ref in sorted(set(pattern.findall(text))):
            if ref not in real:
                missing.append(f"{name}: {ref}")
    assert not missing, "dangling step references:\n" + "\n".join(missing)
