"""Config file parsing (-c): long keywords mapped to short options
(ref src/confparse.c, conf_keywords table src/rtl_433.c:402-438).

Search order: CWD, $XDG_CONFIG_HOME/rtl_433, /usr/local/etc/rtl_433
(ref src/rtl_433.c:110-115).
"""

from __future__ import annotations

import os
from typing import List, Optional

# long keyword -> short option (ref src/rtl_433.c:402-438)
CONF_KEYWORDS = {
    "verbose": "-v",
    "version": "-V",
    "config_file": "-c",
    "report_meta": "-M",
    "device": "-d",
    "gain": "-g",
    "frequency": "-f",
    "hop_interval": "-H",
    "ppm_error": "-p",
    "sample_rate": "-s",
    "protocol": "-R",
    "decoder": "-X",
    "register_all": "-G",
    "out_block_size": "-b",
    "level_limit": "-l",
    "minlevel": "-Y",
    "analyze_bits": "-A",
    "analyze": "-a",
    "include_only": "-I",
    "read_file": "-r",
    "write_file": "-w",
    "overwrite_file": "-W",
    "signal_grabber": "-S",
    "override_short": "-z",
    "override_long": "-x",
    "pulse_detect": "-Y",
    "output": "-F",
    "output_tag": "-K",
    "convert": "-C",
    "duration": "-T",
    "test_data": "-y",
    "stop_after_successful_events": "-E",
}

DEFAULT_CONF_PATHS = [
    "rtl_433.conf",
    os.path.join(os.environ.get("XDG_CONFIG_HOME",
                                os.path.expanduser("~/.config")),
                 "rtl_433", "rtl_433.conf"),
    "/usr/local/etc/rtl_433/rtl_433.conf",
    "/etc/rtl_433/rtl_433.conf",
]


def find_default_conf() -> Optional[str]:
    for p in DEFAULT_CONF_PATHS:
        if os.path.isfile(p):
            return p
    return None


def parse_conf_text(text: str) -> List[str]:
    """Turn conf-file text into an argv list."""
    argv: List[str] = []
    for line in text.splitlines():
        # strip comments (# to end of line, unless in a quoted value)
        out = []
        in_quote = None
        for ch in line:
            if in_quote:
                if ch == in_quote:
                    in_quote = None
                out.append(ch)
            elif ch in "\"'":
                in_quote = ch
                out.append(ch)
            elif ch == "#":
                break
            else:
                out.append(ch)
        line = "".join(out).strip()
        if not line:
            continue
        parts = line.split(None, 1)
        kw = parts[0]
        val = parts[1].strip() if len(parts) > 1 else None
        if val and len(val) >= 2 and val[0] == val[-1] and val[0] in "\"'":
            val = val[1:-1]
        opt = CONF_KEYWORDS.get(kw)
        if opt is None:
            raise ValueError(f"unknown conf keyword: {kw}")
        argv.append(opt)
        if val is not None:
            argv.append(val)
    return argv


def parse_conf_file(path: str) -> List[str]:
    with open(path) as f:
        return parse_conf_text(f.read())
