"""Evaluation-run notifier.

The useful contract of the devkit's `Mail` class (reference
src/evaluate/mail.h:8-46): every `msg()` goes to stdout, and — when an email
address is configured — is also accumulated and handed to a sendmail pipe at
close. Here the transport is pluggable and failure-proof: no sendmail on the
host just means stdout-only, never a crash mid-eval.
"""

from __future__ import annotations

import shutil
import subprocess
from typing import Optional


class Notifier:
    """stdout + optional email notification sink for long eval runs."""

    def __init__(self, email: str = "",
                 subject: str = "KITTI Evaluation Benchmark"):
        self.email = email
        self.subject = subject
        self._lines: list[str] = []

    def msg(self, text: str, *args) -> None:
        """Print a line; buffer it for the email body if one is configured."""
        line = (text % args) if args else text
        print(line, flush=True)
        if self.email:
            self._lines.append(line)

    def close(self) -> None:
        """Flush the buffered body to sendmail, if configured and present."""
        if not (self.email and self._lines):
            return
        sendmail = shutil.which("sendmail") or "/usr/lib/sendmail"
        body = (f"To: {self.email}\nSubject: {self.subject}\n\n\n"
                + "\n".join(self._lines) + "\n")
        try:
            subprocess.run([sendmail, "-t"], input=body.encode(),
                           timeout=30, check=False)
        except (OSError, subprocess.TimeoutExpired):
            pass  # notification is best-effort by design
        self._lines = []

    def __enter__(self) -> "Notifier":
        return self

    def __exit__(self, *exc) -> Optional[bool]:
        self.close()
        return None
