"""The README/PERFORMANCE headline numbers must match the committed
bench artifacts (rounds 3 and 4 both caught hand-edited drift)."""
import subprocess
import sys
import os

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_headline_matches_bench_json():
    out = subprocess.run(
        [sys.executable, os.path.join(ROOT, "scripts",
                                      "gen_readme_numbers.py"), "--check"],
        capture_output=True, text=True)
    assert out.returncode == 0, (
        f"headline drift: {out.stdout} {out.stderr} — run "
        f"python scripts/gen_readme_numbers.py")
