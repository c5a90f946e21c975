"""Estimator plumbing shared by every algorithm class.

Mirrors the reference's ``BaseClass`` convention
(mercury/graph/core/base.py:4-45): ``get_params()`` reflects the
constructor signature back as a sorted {name: value} dict (every
estimator stores each constructor argument under the same attribute
name), and ``__repr__``/``__str__`` render them — so code written
against the reference's estimators (`repr(algo)`, `algo.get_params()`)
ports unchanged.
"""

from __future__ import annotations

import inspect


class BaseClass:
    def get_params(self) -> dict:
        """{parameter name: current value} for every constructor
        parameter (sorted by name)."""
        sig = inspect.signature(self.__init__)
        names = sorted(p for p in sig.parameters if p != "self")
        return {k: getattr(self, k) for k in names}

    def __repr__(self) -> str:
        params = ", ".join(f"{k}={v}" for k, v in self.get_params().items())
        return f"{self.__class__.__name__}({params})"

    def __str__(self) -> str:
        params = ", ".join(f"{k}={v}" for k, v in self.get_params().items())
        lines = [
            f"Object of class {self.__class__.__name__}.",
            "",
            f"Initialization parameters: {params}",
        ]
        # reference convention: str() grows after fit (ml/louvain.py:93-105,
        # spark_randomwalker.py:39-47, spectral.py:43-55) — report fitted
        # trailing-underscore attributes, with the reference's wording for
        # the well-known ones
        fitted = sorted(
            k for k in vars(self) if k.endswith("_") and not k.startswith("_")
        )
        if fitted:
            lines.append("")
            if "labels_" in fitted:
                lines.append("Cluster assignments are available in attribute `labels_`")
            if "paths_" in fitted:
                lines.append("Random walk paths are available in attribute `paths_`.")
            if "modularity_" in fitted:
                lines.append(f"Modularity: {self.modularity_}")
            lines.append(f"Fitted attributes: {', '.join(fitted)}")
        return "\n".join(lines)
