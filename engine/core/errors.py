"""Typed errors with a CLI contract.

`InputRefusedError` marks a deliberate refusal of user input (e.g. the
replaced-corpus guard in engine/index/build.py) — the CLI prints it as one
clean JSON error line with exit code 3. It subclasses ValueError so library
callers that already handle ValueError keep working. Internal errors must
NOT use it: they should stay loud tracebacks (pyarrow's ArrowInvalid and
Ray's worker-side ValueErrors are ValueError subclasses, which is exactly
why the CLI catches only this type)."""

from __future__ import annotations


class InputRefusedError(ValueError):
    pass
