"""--profile_dir writes a jax.profiler trace (SURVEY §5.1)."""

import glob
import os


def test_profile_dir_writes_trace(tmp_path, synth_dir):
    from icl.cli.nonvisual import main

    prof = str(tmp_path / "prof")
    main(["--train", "--data_dir", synth_dir, "--epochs", "1",
          "--batch_size", "32", "--hidden_width", "8",
          "--model_file", str(tmp_path / "m"), "--profile_dir", prof])
    # perfetto trace files appear under <dir>/plugins/profile/<ts>/
    found = glob.glob(os.path.join(prof, "**", "*"), recursive=True)
    assert any(os.path.isfile(f) for f in found), f"no trace files in {prof}"
