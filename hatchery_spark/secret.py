"""Secret string wrapper: never prints its value.

Semantics rebuilt from the reference's secret.String
(/root/reference/pkg/types/secret/string.go:5-19): every formatting path
(str, repr, format, f-string, logging) yields '***'; the raw value is only
reachable via .unmask(). Secrets belong in env vars / spark.conf — never in
DataFrame columns; this wrapper is for driver-side config plumbing.
"""

from __future__ import annotations


class Secret:
    __slots__ = ("_value",)

    MASK = "***"

    def __init__(self, value: str):
        object.__setattr__(self, "_value", value)

    def unmask(self) -> str:
        return self._value

    def __str__(self) -> str:
        return self.MASK

    def __repr__(self) -> str:
        return f"Secret({self.MASK})"

    def __format__(self, spec: str) -> str:
        return format(self.MASK, spec)

    def __eq__(self, other: object) -> bool:
        return isinstance(other, Secret) and other._value == self._value

    def __hash__(self) -> int:
        return hash(("Secret", self._value))

    # never pickle the raw value into logs/checkpoints accidentally
    def __reduce__(self):
        raise TypeError("Secret values must not be serialized")
