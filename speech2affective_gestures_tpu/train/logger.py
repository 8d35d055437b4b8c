"""Work-dir logging + timers.

Capability parity with the reference's torchlight IO helper
(`torchlight/torchlight/io.py`): print_log to stdout + append log.txt,
save_arg session dump (config + command line as YAML), and named split
timers printed per epoch.
"""

from __future__ import annotations

import os
import sys
import time
from collections import defaultdict

import yaml


class TrainLogger:
    def __init__(self, work_dir: str, save_log: bool = True,
                 print_to_stdout: bool = True):
        self.work_dir = work_dir
        self.save_log = save_log
        self.print_to_stdout = print_to_stdout
        os.makedirs(work_dir, exist_ok=True)
        self.cur_time = time.time()
        self.split_timer = defaultdict(float)

    def print_log(self, msg: str, print_time: bool = True):
        if print_time:
            msg = time.strftime("[ %a %b %d %H:%M:%S %Y ] ", time.localtime()) + msg
        if self.print_to_stdout:
            print(msg)
        if self.save_log:
            with open(os.path.join(self.work_dir, "log.txt"), "a") as f:
                f.write(msg + "\n")

    def save_arg(self, arg_obj):
        """Session dump (torchlight io.py:109-119)."""
        arg_dict = (
            vars(arg_obj) if not isinstance(arg_obj, dict) else dict(arg_obj)
        )
        with open(os.path.join(self.work_dir, "config.yaml"), "w") as f:
            f.write(f"# command line: {' '.join(sys.argv)}\n\n")
            yaml.dump(
                {k: v for k, v in arg_dict.items()
                 if isinstance(v, (int, float, str, bool, list, tuple, type(None)))},
                f, default_flow_style=False, indent=4,
            )

    # --- split timers (torchlight io.py:132-157) ---------------------------
    def init_timer(self, *names: str):
        self.record_time()
        self.split_timer = {name: 1e-10 for name in names}

    def record_time(self):
        self.cur_time = time.time()
        return self.cur_time

    def split_time(self, name: str):
        delta = time.time() - self.cur_time
        self.record_time()
        self.split_timer[name] = self.split_timer.get(name, 0.0) + delta
        return delta

    def print_timer(self):
        total = sum(self.split_timer.values())
        proportion = {
            k: f"{int(round(100 * v / total)):02d}%"
            for k, v in self.split_timer.items()
        }
        self.print_log(f"Time consumption: {proportion}")
