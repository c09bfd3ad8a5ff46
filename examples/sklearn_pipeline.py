#!/usr/bin/env python
"""Drop-in sklearn pipeline integration (reference README.md:94-103
shows the same pattern with fast_select)."""

from __future__ import annotations

import sys

sys.path.insert(0, ".")  # run from a checkout without installing

import numpy as np
from sklearn.datasets import make_classification
from sklearn.linear_model import LogisticRegression
from sklearn.model_selection import cross_val_score
from sklearn.pipeline import Pipeline

from fastselect_tpu import MultiSURF


def main() -> None:
    X, y = make_classification(n_samples=600, n_features=300,
                               n_informative=12, random_state=0)
    pipe = Pipeline([
        ("select", MultiSURF(n_features_to_select=24)),
        ("clf", LogisticRegression(max_iter=2000)),
    ])
    scores = cross_val_score(pipe, X, y, cv=3)
    print("cv accuracy:", np.round(scores, 3), "mean",
          round(float(scores.mean()), 3))


if __name__ == "__main__":
    main()
