"""Lightweight observability for optimizer loops.

The reference's only observability was print + integer verbose flags
threaded through every method (SURVEY.md section 5).  Here: a structured
per-iteration record stream with pluggable sinks (stdout, JSONL file,
in-memory), carrying the physics diagnostics (energy, |grad|, lowest
Hessian eigenvalue, line-search t, wall time).
"""

import json
import time


class Monitor:
    """Collects per-iteration records; optionally tees to stdout/JSONL."""

    def __init__(self, stdout=False, jsonl_path=None, label=""):
        self.records = []
        self.stdout = stdout
        self.label = label
        self._fh = open(jsonl_path, "a") if jsonl_path else None
        self._t0 = time.time()

    def log(self, iteration, energy, **metrics):
        rec = {"label": self.label, "iter": int(iteration),
               "energy": float(energy),
               "wall_s": round(time.time() - self._t0, 6)}
        for k, v in metrics.items():
            try:
                rec[k] = float(v)
            except (TypeError, ValueError):
                rec[k] = v
        self.records.append(rec)
        if self.stdout:
            shown = {k: v for k, v in rec.items() if k != "label"}
            print(" ".join(f"{k}={v}" for k, v in shown.items()),
                  flush=True)
        if self._fh:
            self._fh.write(json.dumps(rec) + "\n")
            self._fh.flush()
        return rec

    def close(self):
        if self._fh:
            self._fh.close()
            self._fh = None

    def energies(self):
        return [r["energy"] for r in self.records]
