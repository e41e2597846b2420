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
        group_uas: list[str] = []
        in_rules = False  # inside a group's rule block (after its UA lines)
        for line in body.splitlines():
            line = line.split("#", 1)[0].strip()
            if not line or ":" not in line:
                continue
            field, _, value = line.partition(":")
            field = field.strip().lower()
            value = value.strip()
            if field == "user-agent":
                # consecutive User-agent lines form ONE group (de-facto
                # standard); a UA line after rules starts a new group
                if in_rules:
                    group_uas = []
                    in_rules = False
                group_uas.append(value)
            else:
                in_rules = True
                if field == "disallow" and "*" in group_uas and value:
                    prefixes.append(value)
        return cls(tuple(prefixes))

    ALLOW_ALL: "RobotsRules"


RobotsRules.ALLOW_ALL = RobotsRules(())
