"""Deterministic fixed-width fixture files F1–F4 (FIXTURES.md)."""

from __future__ import annotations

import json
import random

CRLF = "\r\n"

F1_WEBLOG_SCHEMA = json.dumps({
    "type": "record",
    "name": "weblog",
    "fields": [
        {"name": "Idnr", "type": {"type": "long", "len": 8}},
        {"name": "Event_time",
         "type": {"type": "long", "logicalType": "timestamp-micros", "len": 26}},
        {"name": "Idnr2", "type": {"type": "int", "len": 6}},
        {"name": "Ok", "type": {"type": "boolean", "len": 1}},
        {"name": "Some_text1", "type": {"type": "string", "len": 30}},
        {"name": "Some_text2", "type": {"type": "string", "len": 30}},
    ],
})

F2_ALLTYPES_SCHEMA = json.dumps({
    "type": "record",
    "name": "alltypes",
    "fields": [
        {"name": "B", "type": {"type": "boolean", "len": 1}},
        {"name": "Raw", "type": {"type": "Bytes", "len": 4}},
        {"name": "F", "type": {"type": "float", "len": 10}},
        {"name": "D", "type": {"type": "double", "len": 14}},
        {"name": "I", "type": {"type": "int", "len": 6}},
        {"name": "L", "type": {"type": "long", "len": 12}},
        {"name": "S", "type": {"type": "string", "len": 16}},
        {"name": "Dt", "type": {"type": "int", "logicalType": "date", "len": 26}},
        {"name": "Tsm", "type": {"type": "long", "logicalType": "timestamp-millis", "len": 26}},
        {"name": "Tsu", "type": {"type": "long", "logicalType": "timestamp-micros", "len": 26}},
    ],
})

F3_UTF8_SCHEMA = json.dumps({
    "type": "record",
    "name": "utf8",
    "fields": [
        {"name": "Id", "type": {"type": "int", "len": 4}},
        {"name": "Name", "type": {"type": "string", "len": 8}},
        {"name": "City", "type": {"type": "string", "len": 8}},
        {"name": "Note", "type": {"type": "string", "len": 10}},
    ],
})


def _ts(i: int, frac: str) -> str:
    mi, se = divmod(i % 3600, 60)
    return f"2020-07-{9 + i % 20:02d}-{i % 24:02d}.{mi:02d}.{se:02d}.{frac}"


def write_f1(path: str, rows: int = 1000) -> None:
    rng = random.Random(42)
    bools = "JNyn"
    with open(path, "w", newline="") as fh:
        for i in range(rows):
            line = (
                f"{i:8d}"
                + _ts(i, f"{rng.randrange(10**6):06d}")
                + f"{rng.randrange(10**6):6d}"
                + bools[i % 4]
                + f"text1-{i}".ljust(30)
                + f"text2-{rng.randrange(1000)}".ljust(30)
            )
            fh.write(line + CRLF)


def write_f2(path: str, rows: int = 500) -> None:
    rng = random.Random(42)
    with open(path, "w", newline="") as fh:
        for i in range(rows):
            fh.write(
                "JjYyNn"[i % 6]
                + f"b{i % 100:03d}"
                + f"{rng.uniform(-1000, 1000):10.3f}"
                + f"{rng.uniform(-1e6, 1e6):14.5f}"
                + f"{rng.randrange(-99999, 99999):6d}"
                + f"{rng.randrange(-10**11, 10**11):12d}"
                + f"s{i}  padded".ljust(16)
                + _ts(i, f"{rng.randrange(10**6):06d}").ljust(26)
                + (_ts(i, f"{rng.randrange(1000):03d}") + "   ").ljust(26)
                + _ts(i, f"{rng.randrange(10**6):06d}").ljust(26)
                + CRLF
            )
        fh.write("*" * 20 + CRLF)


def write_f3(path: str, rows: int = 200) -> None:
    names = ["åäö-nm", "日本語", "emoji😀x", "Ωmega", "ascii"]
    cities = ["Göteborg", "東京", "Ålesund", "naïve", "π-city"]
    with open(path, "w", newline="", encoding="utf-8") as fh:
        for i in range(rows):
            fh.write(
                f"{i:4d}"
                + names[i % 5].ljust(8)
                + cities[(i + 1) % 5].ljust(8)
                + (f"n{i}-" + "é" * 3).ljust(10)
                + CRLF
            )


def write_f4(path: str, rows: int = 100) -> None:
    """F1 schema, 10 bad rows out of 100."""
    rng = random.Random(42)
    bad = {3, 12, 25, 33, 41, 57, 64, 78, 86, 99}
    with open(path, "w", newline="") as fh:
        for i in range(rows):
            ts = _ts(i, f"{rng.randrange(10**6):06d}")
            idnr = f"{i:8d}"
            idnr2 = f"{rng.randrange(10**6):6d}"
            ok = "JNyn"[i % 4]
            t1, t2 = f"text1-{i}".ljust(30), "t2".ljust(30)
            if i in bad:
                kind = i % 4
                if kind == 0:
                    idnr = "12ab34cd"  # non-numeric Idnr
                elif kind == 1:
                    ts = "2020-13-99-99.99.99.xxxxxx"  # unparseable ts
                elif kind == 2:
                    fh.write(f"{i:8d}short\r\n")  # short row
                    continue
                else:
                    fh.write(idnr + ts + idnr2 + ok + t1 + t2 + "\n")  # LF-only
                    continue
            fh.write(idnr + ts + idnr2 + ok + t1 + t2 + CRLF)
