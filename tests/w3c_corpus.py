"""W3C RDF 1.1 XML test-suite corpus loader.

The corpus (public W3C content, dual W3C Test Suite / BSD licensed) is read
from the reference checkout's vendored copy when present; tests skip when it
is unavailable. Convention: ``<dir>/<name>.rdf`` with a sibling ``.nt`` is a
positive eval case (compare via isomorphism), without one it is a
negative-syntax case (decode must error) — matching the manifest split
(128 eval / 41 negative).
"""

from __future__ import annotations

import os
from dataclasses import dataclass

W3C_DIR = os.environ.get(
    "W3C_RDFXML_SUITE_DIR",
    "/root/reference/test/data/w3c-rdf-1.1-xml-test-suite",
)
BASE_URL = "http://www.w3.org/2013/RDFXMLTests/"


@dataclass
class W3CCase:
    name: str  # e.g. "datatypes/test001"
    rdf_path: str
    nt_path: str | None  # None → negative-syntax case

    @property
    def base(self) -> str:
        return f"{BASE_URL}{self.name}.rdf"

    @property
    def positive(self) -> bool:
        return self.nt_path is not None


def load_cases() -> list[W3CCase]:
    if not os.path.isdir(W3C_DIR):
        return []
    cases = []
    for d in sorted(os.listdir(W3C_DIR)):
        sub = os.path.join(W3C_DIR, d)
        if not os.path.isdir(sub):
            continue
        for f in sorted(os.listdir(sub)):
            if not f.endswith(".rdf"):
                continue
            stem = f[:-4]
            nt = os.path.join(sub, stem + ".nt")
            cases.append(
                W3CCase(
                    name=f"{d}/{stem}",
                    rdf_path=os.path.join(sub, f),
                    nt_path=nt if os.path.exists(nt) else None,
                )
            )
    return cases
