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


def _usage_fences():
    """The ```python code fences of docs/usage.md, in order."""
    with open(os.path.join(DOCS, "usage.md")) as f:
        text = f.read()
    return re.findall(r"```python\n(.*?)```", text, flags=re.DOTALL)


def test_usage_md_fences_execute(tmp_path, monkeypatch):
    """Every python code fence in docs/usage.md runs as written.

    Completes the reference's doctest discipline (reference setup.cfg
    runs docs/usage.rst as doctests): editing a snippet to a nonexistent
    API or a wrong call signature breaks this test.  The snippets run in
    a tmp cwd holding a synthetic `cube.fits`, with the few free
    variables of the fleet-API fence (cube/var/mask/psf/profiles)
    predefined — everything else executes verbatim.
    """
    sys.path.insert(0, os.path.dirname(__file__))
    try:
        from make_minicube import make_minicube
    finally:
        sys.path.remove(os.path.dirname(__file__))

    fences = _usage_fences()
    assert len(fences) >= 3, "usage.md lost its executable examples"

    monkeypatch.chdir(tmp_path)
    # ny=40: divides over the 8-device test mesh of the multi-chip fence
    make_minicube(str(tmp_path / "cube.fits"), nz=150, ny=40, nx=40)

    import jax
    import numpy as np
    from origin_tpu.core import MoffatFSF, gaussian_profile

    rng = np.random.default_rng(3)
    nz, ny, nx = 60, 16, 16
    free = dict(
        cubes=jax.numpy.asarray(
            rng.normal(size=(2, nz, ny, nx)).astype(np.float32)),
        variances=jax.numpy.ones((2, nz, ny, nx), np.float32),
        masks=jax.numpy.zeros((2, nz, ny, nx), bool),
        psf=MoffatFSF(fwhm_pol=[0.7], beta_pol=[2.8], pixstep=0.2)
        .get_3darray(4750.0 + 1.25 * np.arange(nz), (7, 7))
        .astype(np.float32),
        profiles=[gaussian_profile(f) for f in (2.0, 6.7)],
    )

    for i, src in enumerate(fences):
        ns = dict(free)
        exec(compile(src, f"usage.md[fence {i}]", "exec"), ns)  # noqa: S102

    # the walkthrough fence really ran: its session + catalog are on disk
    assert (tmp_path / "session1" / "session1.yaml").exists()
    assert (tmp_path / "session1" / "Cat3_sources.fits").exists()
    assert (tmp_path / "session1" / "sources").exists()
    # close any logfile handlers the snippets opened
    import logging

    for h in list(logging.getLogger("origin_tpu").handlers):
        h.close()


def test_reference_parity_surface_resolves():
    """Every top-level name the reference package exports (its __init__
    star-exports lib_origin.__all__ + the step framework + the artifact
    entry points) resolves on origin_tpu to a real callable/class, and
    dir() advertises them."""
    import origin_tpu

    for name in origin_tpu._REF_PARITY:
        obj = getattr(origin_tpu, name)
        assert obj is not None, name
        assert callable(obj) or name == "STEPS", name
    d = dir(origin_tpu)
    assert "Correlation_GLR_test" in d and "spatiospectral_merging" in d
    # canonical homes unchanged
    from origin_tpu.detect import spatiospectral_merging
    assert origin_tpu.spatiospectral_merging is spatiospectral_merging
import os
import subprocess
import sys

def test_make_walkthrough_small_warm(tmp_path):
    """The walkthrough generator's --small self-test, with --warm: runs
    the reduced pipeline twice and writes a complete artifact with the
    capture-conditions note and a total row."""
    out = tmp_path / "walk.md"
    env = dict(os.environ)
    # keep the subprocess OFF the tunneled TPU: drop the axon
    # sitecustomize from PYTHONPATH (it force-registers the axon
    # platform before any env var can bite) and pin CPU
    env["PYTHONPATH"] = ":".join(
        p for p in env.get("PYTHONPATH", "").split(":")
        if p and "axon_site" not in p)
    env["JAX_PLATFORMS"] = "cpu"
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    proc = subprocess.run(
        [sys.executable, os.path.join(repo, "tools", "make_walkthrough.py"),
         "--small", "--warm", "--out", str(out),
         "--workdir", str(tmp_path / "wd")],
        capture_output=True, text=True, timeout=900, env=env,
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    text = out.read_text()
    assert "capture conditions: WARM pass" in text
    assert "| **total** |" in text
    assert "step11_save_sources" in text
    assert "Final catalog:" in text
