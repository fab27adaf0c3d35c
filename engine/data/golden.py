"""Golden end-to-end document pair (synthetic analog of the reference's
tests/valid.json / tests/invalid.json — regenerated, not copied).

A ~9 KB array of 6 person records; the invalid variant applies exactly the
reference's two mutations (SURVEY.md §5.3): one value loses its quotes, and
the final ``]`` is dropped.  Repairing the invalid text must reproduce the
valid object byte-for-byte.
"""

from __future__ import annotations

import json

import numpy as np

FIRST = ["Keisha", "Sunny", "Marco", "Lena", "Tariq", "Aino", "Ravi", "Mona"]
LAST = ["Corwin", "Goodwin", "Ferro", "Okafor", "Lindqvist", "Park", "Iyer"]
FRUIT = ["apple", "banana", "strawberry"]
EYES = ["blue", "brown", "green"]
WORDS = ("lorem ipsum dolor sit amet consectetur adipiscing elit sed do eiusmod "
         "tempor incididunt ut labore et dolore magna aliqua").split()


def _record(rng: np.random.Generator, idx: int) -> dict:
    name = f"{FIRST[rng.integers(0, len(FIRST))]} {LAST[rng.integers(0, len(LAST))]}"
    about = " ".join(WORDS[rng.integers(0, len(WORDS))] for _ in range(75)) + "."
    return {
        "_id": "".join(f"{rng.integers(0, 16):x}" for _ in range(24)),
        "index": idx,
        "guid": "-".join("".join(f"{rng.integers(0, 16):x}" for _ in range(n))
                         for n in (8, 4, 4, 4, 12)),
        "isActive": bool(rng.integers(0, 2)),
        "balance": f"${rng.integers(1, 4)},{rng.integers(0, 1000):03d}.{rng.integers(0, 100):02d}",
        "picture": "http://placehold.it/32x32",
        "age": int(rng.integers(20, 40)),
        "eyeColor": EYES[rng.integers(0, len(EYES))],
        "name": name,
        "gender": ["female", "male"][rng.integers(0, 2)],
        "company": "".join(FIRST[rng.integers(0, len(FIRST))] for _ in range(2)).upper(),
        "email": name.lower().replace(" ", ".") + "@example.org",
        "phone": f"+1 ({rng.integers(800, 999)}) {rng.integers(400, 600)}-{rng.integers(2000, 4000)}",
        "address": f"{rng.integers(100, 999)} {LAST[rng.integers(0, len(LAST))]} Street, "
                   f"{FIRST[rng.integers(0, len(FIRST))]}, State, {rng.integers(1000, 9999)}",
        "about": about,
        "registered": f"20{rng.integers(14, 24):02d}-{rng.integers(1, 13):02d}-"
                      f"{rng.integers(1, 29):02d}T{rng.integers(0, 24):02d}:"
                      f"{rng.integers(0, 60):02d}:{rng.integers(0, 60):02d} -02:00",
        "latitude": round(float(rng.uniform(-90, 90)), 6),
        "longitude": round(float(rng.uniform(-180, 180)), 6),
        "tags": [WORDS[rng.integers(0, len(WORDS))] for _ in range(7)],
        "friends": [{"id": k, "name": f"{FIRST[rng.integers(0, len(FIRST))]} "
                                      f"{LAST[rng.integers(0, len(LAST))]}"} for k in range(3)],
        "greeting": f"Hello, {name}! You have {rng.integers(1, 11)} unread messages.",
        "favoriteFruit": FRUIT[rng.integers(0, len(FRUIT))],
    }


def golden_pair(seed: int = 42) -> tuple[str, str]:
    """(valid_text, invalid_text) — invalid = unquote one value + drop final ']'."""
    rng = np.random.default_rng(seed)
    records = [_record(rng, i) for i in range(6)]
    valid = json.dumps(records, indent=2)
    # Mutation 1: strip the quotes around one eyeColor value (an unquoted
    # string literal — the reference's line-262 mutation shape).
    target = f'"eyeColor": "{records[3]["eyeColor"]}"'
    replacement = f'"eyeColor": {records[3]["eyeColor"]}'
    assert target in valid
    invalid = valid.replace(target, replacement, 1)
    # Mutation 2: drop the closing bracket.
    assert invalid.rstrip().endswith("]")
    invalid = invalid.rstrip()[:-1]
    return valid, invalid
