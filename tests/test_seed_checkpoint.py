"""seed_checkpoint archive/restore round-trip (pure filesystem, no jax)."""

import os

from ideas_tpu.tools import seed_checkpoint


def _mk(path, content=b"x"):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "wb") as f:
        f.write(content)


def test_archive_picks_latest_completed_and_restores(tmp_path):
    exp = tmp_path / "experiments" / "myrun"
    # two completed steps + one orbax in-progress tmp dir (must be skipped)
    _mk(str(exp / "checkpoints" / "1000" / "state" / "a.bin"), b"old")
    _mk(str(exp / "checkpoints" / "3000" / "state" / "a.bin"), b"new")
    _mk(str(exp / "checkpoints" / "5000.orbax-checkpoint-tmp-123" / "p"), b"t")
    _mk(str(exp / "training_config.txt"), b"cfg")

    seeds = tmp_path / "seeds"
    out = seed_checkpoint.archive(str(exp), str(seeds))
    assert os.path.exists(out)
    assert (seeds / "myrun.seed.json").exists()

    dest = tmp_path / "experiments2"
    seed_checkpoint.restore(out, str(dest))
    restored = dest / "myrun" / "checkpoints" / "3000" / "state" / "a.bin"
    assert restored.read_bytes() == b"new"
    assert not (dest / "myrun" / "checkpoints" / "1000").exists()
    assert (dest / "myrun" / "training_config.txt").read_bytes() == b"cfg"


def test_archive_errors_when_no_completed_step(tmp_path):
    exp = tmp_path / "e"
    _mk(str(exp / "checkpoints" / "100.orbax-checkpoint-tmp-9" / "p"))
    try:
        seed_checkpoint.archive(str(exp), str(tmp_path / "s"))
    except FileNotFoundError:
        pass
    else:
        raise AssertionError("expected FileNotFoundError")
