"""Regenerate the headline numbers in README.md / PERFORMANCE.md from the
committed bench artifacts (BENCH_r*.json + BENCH_MATRIX.json).

Rounds 3 and 4 both caught hand-edited headline drift; this script makes
the committed JSON the single source of truth.  Run after every bench
refresh:

    python scripts/gen_readme_numbers.py          # rewrite in place
    python scripts/gen_readme_numbers.py --check  # exit 1 on drift

tests/test_readme_numbers.py runs --check in CI.
"""
import glob
import json
import os
import re
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def load():
    bench_files = sorted(glob.glob(os.path.join(ROOT, "BENCH_r*.json")))
    head = json.load(open(bench_files[-1]))["parsed"]
    matrix = {r["metric"]: r
              for r in json.load(open(os.path.join(ROOT,
                                                   "BENCH_MATRIX.json")))}
    return os.path.basename(bench_files[-1]), head, matrix


def fmt_sig(v, digits=3):
    """1.2985e10 -> '1.30e10' style (two decimals, no plus signs)."""
    m = f"{v:.{digits - 1}e}"
    mant, exp = m.split("e")
    return f"{mant}e{int(exp)}"


def sub(text, pattern, repl, label, count=1):
    out, n = re.subn(pattern, repl, text, count=count)
    if n != count:
        raise SystemExit(f"pattern for {label} matched {n} times "
                         f"(wanted {count}): {pattern}")
    return out


def gen_readme(text, src, head, matrix):
    v = head["value"]
    vs = head["vs_baseline"]
    block = (f'$ python bench.py\n'
             f'{{"metric": "freezing_gradp_cell_rhs_evals_per_s", '
             f'"value": {fmt_sig(v)},\n'
             f' "unit": "cell*RHS-evals/s/chip", '
             f'"vs_baseline": {vs:.1f}}}')
    text = sub(text, r"(?s)\$ python bench\.py\n.*?\}",
               block.replace("\\", r"\\"), "README bench block",
               )
    text = sub(text, r"~\d+× the throughput of the reference's full "
               r"32-core node",
               f"~{vs:.0f}× the throughput of the reference's full "
               f"32-core node", "README headline multiple")
    mr_lo = min(matrix[m]["vs_baseline"] for m in (
        "freezing_gradp_cell_rhs_evals_per_s",
        "freezing_sigmap_mr_cell_rhs_evals_per_s",
        "freezing_temp_mr_cell_rhs_evals_per_s"))
    mr_hi = max(matrix[m]["vs_baseline"] for m in (
        "freezing_gradp_cell_rhs_evals_per_s",
        "freezing_sigmap_mr_cell_rhs_evals_per_s",
        "freezing_temp_mr_cell_rhs_evals_per_s"))
    text = sub(text, r"MR runs \d+–\d+× the 32-core\nnode",
               f"MR runs {mr_lo:.0f}–{mr_hi:.0f}× the 32-core\nnode",
               "README MR range")
    hr_temp = matrix["freezing_temp_hr_cell_rhs_evals_per_s"][
        "vs_baseline"]
    text = sub(text, r"configuration ~\d+×",
               f"configuration ~{hr_temp:.0f}×", "README HR multiple")
    return text


def gen_performance(text, src, head, matrix):
    v = head["value"]
    vs = head["vs_baseline"]
    rnd = re.search(r"BENCH_r0*(\d+)", src).group(1)
    text = sub(
        text,
        r"\| freezing GradP throughput \(bench\.py, round \d+\) \| "
        r"\*\*[\d.]+×10[¹²⁰³⁴⁵⁶⁷⁸⁹]+ cell·RHS-evals/s/chip\*\* \| "
        r"\*\*[\d.]+×\*\*",
        f"| freezing GradP throughput (bench.py, round {rnd}) | "
        f"**{_sup(v)} cell·RHS-evals/s/chip** | **{vs:.1f}×**",
        "PERFORMANCE headline row")

    def cell(metric):
        r = matrix[metric]
        val = fmt_sig(r["value"], 3)
        b = r.get("vs_baseline")
        if b:
            bs = f"{b:.1f}" if b < 10 else f"{b:.0f}"
            return f"{val} (**{bs}×** " + (
                "32c)" if "hr" not in metric
                else ("384 cores)" if "sigmap" in metric
                      else "224 cores)"))
        return f"{val} (no ref run)"

    table = (
        "| grid \\ model | GradP | SigmaP1-P | Temp |\n"
        "|---|---|---|---|\n"
        f"| LR (0.25 M cells) | {cell('freezing_gradp_lr_cell_rhs_evals_per_s')} "
        f"| {cell('freezing_sigmap_lr_cell_rhs_evals_per_s')} "
        f"| {cell('freezing_temp_lr_cell_rhs_evals_per_s')} |\n"
        f"| MR (2 M cells) | {cell('freezing_gradp_cell_rhs_evals_per_s')} "
        f"| {cell('freezing_sigmap_mr_cell_rhs_evals_per_s')} "
        f"| {cell('freezing_temp_mr_cell_rhs_evals_per_s')} |\n"
        f"| HR (16 M cells) | {cell('freezing_gradp_hr_cell_rhs_evals_per_s')} "
        f"| {cell('freezing_sigmap_hr_cell_rhs_evals_per_s')} "
        f"| {cell('freezing_temp_hr_cell_rhs_evals_per_s')} |")
    text = sub(text,
               r"\| grid \\ model \| GradP \| SigmaP1-P \| Temp \|\n"
               r"\|---\|---\|---\|---\|\n(\|[^\n]*\n){2}\|[^\n]*\|",
               table.replace("\\", "\\\\"), "PERFORMANCE matrix table")
    return text


_SUP = str.maketrans("0123456789", "⁰¹²³⁴⁵⁶⁷⁸⁹")


def _sup(v):
    mant, exp = fmt_sig(v).split("e")
    return f"{mant}×10{str(exp).translate(_SUP)}"


def main():
    check = "--check" in sys.argv
    src, head, matrix = load()
    drift = []
    for name, gen in (("README.md", gen_readme),
                      ("PERFORMANCE.md", gen_performance)):
        path = os.path.join(ROOT, name)
        old = open(path).read()
        new = gen(old, src, head, matrix)
        if new != old:
            drift.append(name)
            if not check:
                open(path, "w").write(new)
    if drift:
        verb = "drifted from" if check else "regenerated from"
        print(f"{', '.join(drift)} {verb} {src}")
        if check:
            sys.exit(1)
    else:
        print(f"headline numbers match {src}")


if __name__ == "__main__":
    main()
