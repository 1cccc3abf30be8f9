"""Deterministic reference-parity CSV fixtures (FIXTURES.md §A; mirrors the
shape of the reference's fake_data, test_pset.py:26-119, but bigger — enough
rows for the classifier to fit and for value-level assertions)."""

from __future__ import annotations

import csv
import os
import random

ATTR_HEADER = [
    "TRANSACTION_ID", "TLD", "REN", "REGISTRAR_NAME", "GL_CODE_NAME",
    "COUNTRY", "DOMAIN_LENGTH", "HISTORY", "TRANSFERS", "TERM_LENGTH",
    "RES30", "RESTORES", "REREG", "QTILE", "HD", "NS_V0", "NS_V1", "NS_V2",
    "TARGET",
]

TLDS = ["TLD1", "TLD2", "TLD3"]
REGISTRARS = ["ACC 012", "ACC 044", "ACC 101"]
GLS = ["GL1", "GL2"]
COUNTRIES = ["CNTR 04", "CNTR 11", "CNTR 19"]
HISTORIES = ["/AR:1/AR:1/TR:1", "/CR:1/RE:2", "/AR:3", "/TR:1/RE:1"]
TERMS = ["TL01", "TL02"]
QTILES = ["Q1", "Q2", "Q3", "Q4"]
HDS = ["A", "B"]


def _attr_row(rng: random.Random, tid: int, with_target: bool) -> dict:
    ren = rng.randint(0, 9)
    dl = rng.randint(3, 20)
    ns0, ns1, ns2 = (round(rng.random(), 9) for _ in range(3))
    row = {
        "TRANSACTION_ID": tid,
        "TLD": rng.choice(TLDS),
        "REN": ren,
        "REGISTRAR_NAME": rng.choice(REGISTRARS),
        "GL_CODE_NAME": rng.choice(GLS),
        "COUNTRY": rng.choice(COUNTRIES),
        "DOMAIN_LENGTH": dl,
        "HISTORY": rng.choice(HISTORIES),
        "TRANSFERS": rng.randint(0, 4),
        "TERM_LENGTH": rng.choice(TERMS),
        "RES30": rng.randint(0, 1),
        "RESTORES": rng.randint(0, 2),
        "REREG": rng.choice(["Y", "N"]),
        "QTILE": rng.choice(QTILES),
        "HD": rng.choice(HDS),
        "NS_V0": ns0,
        "NS_V1": ns1,
        "NS_V2": ns2,
    }
    if with_target:
        # label correlated with REN + NS_V0 so the model has signal
        p = 0.15 + 0.06 * ren + 0.3 * ns0
        row["TARGET"] = 1 if rng.random() < min(p, 0.95) else 0
    return row


def write_fixtures(root: str, n_train: int = 300, n_test: int = 120, seed: int = 7) -> dict:
    """Write the five CSV datasets under ``root`` (layout tasks.py:114-149);
    returns summary stats for assertions."""
    rng = random.Random(seed)
    dirs = {
        "train_attr": "train/attr",
        "train_tscore": "train/tscore",
        "test_attr": "test/attr",
        "test_tscore": "test/tscore",
        "actuals": "results",
    }
    for d in dirs.values():
        os.makedirs(os.path.join(root, d), exist_ok=True)

    train = [_attr_row(rng, 100000 + i, True) for i in range(n_train)]
    test = [_attr_row(rng, 200000 + i, False) for i in range(n_test)]
    actual_rows = [
        {"TRANSACTION_ID": r["TRANSACTION_ID"], "TARGET": rng.randint(0, 1)} for r in test
    ]

    def dump(subdir: str, header: list[str], rows: list[dict]) -> None:
        with open(os.path.join(root, subdir, "data.csv"), "w", newline="") as f:
            w = csv.DictWriter(f, fieldnames=header)
            w.writeheader()
            w.writerows(rows)

    dump(dirs["train_attr"], ATTR_HEADER, train)
    dump(dirs["test_attr"], [c for c in ATTR_HEADER if c != "TARGET"], test)
    dump(
        dirs["train_tscore"],
        ["TRANSACTION_ID", "TRAFFIC_SCORE"],
        [
            {"TRANSACTION_ID": r["TRANSACTION_ID"], "TRAFFIC_SCORE": round(rng.random() * 1e-4, 12)}
            for r in train
        ],
    )
    dump(
        dirs["test_tscore"],
        ["TRANSACTION_ID", "TRAFFIC_SCORE"],
        [
            {"TRANSACTION_ID": r["TRANSACTION_ID"], "TRAFFIC_SCORE": round(rng.random() * 1e-4, 12)}
            for r in test
        ],
    )
    dump(dirs["actuals"], ["TRANSACTION_ID", "TARGET"], actual_rows)

    return {
        "n_train": n_train,
        "n_test": n_test,
        "train_max_ren": max(r["REN"] for r in train),
        "train_max_domain_length": max(r["DOMAIN_LENGTH"] for r in train),
        "actual_rate": sum(r["TARGET"] for r in actual_rows) / n_test,
    }
