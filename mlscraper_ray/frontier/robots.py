"""Minimal robots.txt handling for the politeness gate.

Parses ``User-agent: *`` groups' ``Disallow:`` prefix rules (the only
dialect the synthetic corpus emits; unknown directives are ignored).
An empty Disallow means allow-all, per the de-facto standard.
"""
from __future__ import annotations


class RobotsRules:
    __slots__ = ("disallow_prefixes",)

    def __init__(self, disallow_prefixes: tuple = ()):
        self.disallow_prefixes = disallow_prefixes

    def allowed(self, path: str) -> bool:
        return not any(path.startswith(p) for p in self.disallow_prefixes)

    @classmethod
    def parse(cls, body: str) -> "RobotsRules":
        prefixes = []
        in_star_group = False
        for line in body.splitlines():
            line = line.split("#", 1)[0].strip()
            if not line or ":" not in line:
                continue
            field, _, value = line.partition(":")
            field = field.strip().lower()
            value = value.strip()
            if field == "user-agent":
                in_star_group = value == "*"
            elif field == "disallow" and in_star_group and value:
                prefixes.append(value)
        return cls(tuple(prefixes))

    ALLOW_ALL: "RobotsRules"


RobotsRules.ALLOW_ALL = RobotsRules(())
