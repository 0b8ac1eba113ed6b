"""ICI communication model across mesh sizes (VERDICT r4 #6).

Runs the full-schedule multichip dryrun (__graft_entry__.dryrun_multichip)
at n_devices in {2, 4, 8} on a virtual CPU mesh — one subprocess per size,
since the device count must be fixed before backend init — and tabulates
the per-device all-to-all accounting: tuned send_cap, forward a2a payload
MB/device/step, and the capacity events (a2a grow/shrink) the tuner fired.

The reference's analogue is its per-iteration communication inventory
(SURVEY.md §3.2; i2jsend all2all sizing in gaussian_renderer/
distribution_procs.py) — sized dynamically there, statically-tuned here.

Usage: python scripts/ici_scaling.py [--sizes 2 4 8] [--out FILE.json]
"""

import argparse
import json
import os
import re
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_SNIPPET = """
import jax
jax.config.update('jax_platforms', 'cpu')
jax.config.update('jax_num_cpu_devices', {n})
import sys; sys.path.insert(0, {root!r})
import __graft_entry__
__graft_entry__.dryrun_multichip({n})
"""


def run_size(n: int) -> dict:
    out = subprocess.run(
        [sys.executable, "-c", _SNIPPET.format(n=n, root=ROOT)],
        capture_output=True, text=True, timeout=3600, cwd=ROOT)
    assert out.returncode == 0, out.stdout[-2000:] + out.stderr[-2000:]
    line = [l for l in out.stdout.splitlines()
            if l.startswith(f"dryrun_multichip({n})")][-1]
    rec = {"n_devices": n, "line": line}
    for key, rx, cast in (
            ("send_cap", r"a2a_send_cap=(\d+)/dest", int),
            ("a2a_fwd_mb_dev_step", r"a2a_fwd_volume=([\d.]+)MB", float),
            ("n_alive", r"n_alive=(\d+)", int),
            ("events", r"capacity_events=(\[[^\]]*\])", None),
            ("max_rel_loss_diff", r"max_rel_loss_diff=([\d.e+-]+)", float),
            ("dpsnr", r"dpsnr=([\d.]+)dB", float)):
        m = re.search(rx, line)
        if m:
            rec[key] = cast(m.group(1)) if cast else m.group(1)
    return rec


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sizes", type=int, nargs="+", default=[2, 4, 8])
    ap.add_argument("--out", type=str, default="")
    a = ap.parse_args()
    rows = []
    for n in a.sizes:
        print(f"== n_devices={n} ==", flush=True)
        rec = run_size(n)
        print(rec["line"], flush=True)
        rows.append(rec)
    print("\n| D | send_cap/dest | a2a fwd MB/dev/step | n_alive | "
          "events | dPSNR vs 1dev |")
    print("|---|---|---|---|---|---|")
    for r in rows:
        print(f"| {r['n_devices']} | {r.get('send_cap')} | "
              f"{r.get('a2a_fwd_mb_dev_step')} | {r.get('n_alive')} | "
              f"{r.get('events')} | {r.get('dpsnr')} |")
    if a.out:
        with open(a.out, "w") as f:
            json.dump(rows, f, indent=1)
        print(f"wrote {a.out}")


if __name__ == "__main__":
    main()
