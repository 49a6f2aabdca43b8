"""Defense output scoring (reference: ``defense/check_output.py:28-48``).

Defenses emit a ``filename,label`` CSV of predictions; ASR compares against
the ground-truth ``labels.csv`` with the reference's off-by-one convention
(ground-truth CSVs are 1-indexed, prediction CSVs 0-indexed → START=1).
"""
from __future__ import annotations

import csv
from typing import Dict


def load_label_csv(path: str, column: int = 1) -> Dict[str, int]:
    out = {}
    with open(path, newline="") as f:
        reader = csv.reader(f)
        header = next(reader)
        for row in reader:
            if row:
                out[row[0]] = int(row[column])
    return out


def write_label_csv(path: str, preds: Dict[str, int]) -> None:
    with open(path, "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["filename", "label"])
        for name, lbl in preds.items():
            w.writerow([name, int(lbl)])


def asr_from_labels(label_file: str, output_file: str, targeted: bool = False,
                    start: int = 1) -> float:
    """ASR% given ground-truth and prediction CSVs (``check_output.py:32-48``)."""
    f2l = load_label_csv(label_file, column=2 if targeted else 1)
    check = load_label_csv(output_file)
    wrong = sum(
        1 for k in f2l if int(f2l[k]) - start != int(check.get(k, -10**9))
    )
    n = max(len(f2l), 1)
    if not targeted:
        return wrong / n * 100.0
    return 100.0 - wrong / n * 100.0
