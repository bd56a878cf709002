"""Make-style goal engine: lazy, file-backed dependency DAG.

Reference equivalent: base make/Goal.java, ObjectGoal.java, FileGoal.java,
FileDownloadGoal.java, Maker.java. Semantics preserved:

  * a goal is "made" when its outputs exist (FileGoal: all files exist and
    are non-empty, ref FileGoal.java:104-112) or its in-memory value is set
    (ObjectGoal); make() first makes all non-weak dependencies
    (ref Goal.java:216-243).
  * ObjectGoal dependencies are weak: they are not auto-made, only made
    lazily via get() (ref Goal.java:199-201, ObjectGoal.java:65-68).
  * clean() removes this goal's outputs; clean_all() also cleans transitive
    dependencies (ref Goal.java:377-433). ObjectGoals release their value
    automatically once all *potentially required* dependents are made
    (memory-release backbone, ref ObjectGoal.java:56-58 +
    Goal.java:123-142,216-243 markPotentiallyRequired/dependentMade), and
    explicitly via Maker.dump_all().
"""

from __future__ import annotations

import logging
import os
import resource
from pathlib import Path

log = logging.getLogger("genestrip")


class _NestingFilter(logging.Filter):
    """Indents log messages by the current goal-recursion depth
    (ref: base util/GSLogFactory.java:62-70 incN/decN — the reference's
    custom commons-logging factory indents nested goal output)."""

    depth = 0

    def filter(self, record: logging.LogRecord) -> bool:
        if self.depth > 0 and isinstance(record.msg, str):
            record.msg = ". " * self.depth + record.msg
        return True


_nesting = _NestingFilter()
log.addFilter(_nesting)


class Goal:
    def __init__(self, project, name: str, deps: list["Goal"] | None = None,
                 user_goal: bool = False):
        self.project = project
        self.name = name
        self.deps: list[Goal] = [d for d in (deps or []) if d is not None]
        self.dependents: list[Goal] = []
        self.user_goal = user_goal
        self._made = False
        self._potentially_required = False
        # cycle check (ref Goal.java:61-75)
        seen = set()

        def walk(g):
            if g is self:
                raise ValueError(f"Cyclic goal dependency at {self.name}")
            if id(g) in seen:
                return
            seen.add(id(g))
            for d in g.deps:
                walk(d)
        for d in self.deps:
            walk(d)
            d.dependents.append(self)

    # -- state ---------------------------------------------------------------

    def is_made(self) -> bool:
        return self._made

    def is_weak(self) -> bool:
        """Weak deps are not auto-made by dependents (ObjectGoal semantics)."""
        return False

    def make(self) -> None:
        """Make dependencies, then this goal (ref Goal.java:216-243): the
        transitive dependency closure is marked potentially-required for the
        duration so ObjectGoals can release their values as soon as every
        dependent that may still need them is made."""
        if self.is_made():
            return
        try:
            self.mark_potentially_required(True)
            _nesting.depth += 1
            try:
                for d in self.deps:
                    if not d.is_weak():
                        d.make()
            finally:
                _nesting.depth -= 1
            self.make_this()
        finally:
            self.mark_potentially_required(False)

    def make_this(self) -> None:
        """Make only this goal, then notify dependencies
        (ref Goal.makeThis:315-331)."""
        if not self.is_made():
            log.info("Making goal %s", self.name)
            self.do_make()
            self._made = True
            self._log_heap()
            for d in self.deps:
                d.dependent_made(self)

    def mark_potentially_required(self, mark: bool) -> None:
        """(Un)mark this goal + transitive deps (ref Goal.java:250-262)."""
        if self._potentially_required == mark:
            return
        self._potentially_required = mark
        for d in self.deps:
            d.mark_potentially_required(mark)

    def dependent_made(self, goal: "Goal") -> None:
        """Trigger all_dependents_made once no potentially-required dependent
        remains unmade (ref Goal.dependentMade:123-142)."""
        for dep in self.dependents:
            if dep._potentially_required and not dep.is_made():
                return
        self.all_dependents_made()

    def all_dependents_made(self) -> None:
        """Memory-release hook (ref Goal.allDependentsMade); default no-op."""

    # Goals that allocate heavily log memory at INFO after making
    # (ref: Goal.logHeapInfo:277-290 + the LogHeapInfo marker interface)
    log_heap_info = False

    def _log_heap(self) -> None:
        level = logging.INFO if self.log_heap_info else logging.DEBUG
        if log.isEnabledFor(level):
            rss_mb = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss // 1024
            log.log(level, "Peak RSS after goal %s: %d MB", self.name, rss_mb)

    def do_make(self) -> None:
        pass

    # -- clean ---------------------------------------------------------------

    def clean_this(self) -> None:
        pass

    def clean(self, total: bool = False) -> None:
        self.clean_this()
        self._made = False

    def clean_all(self, total: bool = False) -> None:
        """Clean this goal and its transitive dependencies. Without `total`,
        goals flagged keep_on_clean_all (e.g. downloads) are kept."""
        self.clean(total)
        for d in self.deps:
            if total or not d.keep_on_clean_all():
                d.clean_all(total)

    def keep_on_clean_all(self) -> bool:
        return False

    def dump(self) -> None:
        """Release in-memory state."""
        self._made = False

    def __repr__(self):
        return f"Goal({self.name})"


class ObjectGoal(Goal):
    """A goal holding an in-memory value; get() lazily makes it."""

    def __init__(self, project, name, deps=None, func=None):
        super().__init__(project, name, deps)
        self._value = None
        self._func = func

    def is_weak(self) -> bool:
        return True

    def is_made(self) -> bool:
        return self._value is not None

    def get(self):
        if self._value is None:
            self.make()
        return self._value

    def set(self, value) -> None:
        self._value = value
        self._made = True

    def do_make(self) -> None:
        if self._func is not None:
            self.set(self._func())
        if self._value is None:
            raise RuntimeError(f"ObjectGoal {self.name} did not produce a value")

    def all_dependents_made(self) -> None:
        """Free the held value once no potentially-required dependent still
        needs it (ref ObjectGoal.allDependentsMade:56-58). A later get()
        lazily recomputes."""
        if self._value is not None:
            log.debug("Releasing object goal %s", self.name)
        self.dump()

    def dump(self) -> None:
        self._value = None
        self._made = False

    def clean(self, total: bool = False) -> None:
        self.dump()


class FileGoal(Goal):
    """Made iff all of its files exist and are non-empty."""

    def __init__(self, project, name, files=None, deps=None, user_goal=False):
        super().__init__(project, name, deps, user_goal)
        self._files = [Path(f) for f in (files or [])]

    @property
    def files(self) -> list[Path]:
        return self._files

    def add_file(self, f) -> None:
        self._files.append(Path(f))

    def is_made(self) -> bool:
        return bool(self._files) and all(
            f.exists() and (f.is_dir() or f.stat().st_size > 0 or self.allow_empty_files())
            for f in self._files)

    def allow_empty_files(self) -> bool:
        return False

    def do_make(self) -> None:
        for f in self._files:
            if not (f.exists() and (f.is_dir() or f.stat().st_size > 0 or self.allow_empty_files())):
                f.parent.mkdir(parents=True, exist_ok=True)
                self.make_file(f)

    def make_file(self, f: Path) -> None:
        raise NotImplementedError

    def clean_this(self) -> None:
        for f in self._files:
            if f.exists() and not f.is_dir():
                log.info("Deleting file %s", f)
                os.unlink(f)


class MkdirGoal(FileGoal):
    """Creates directories (ref: GSMaker commonsetup/setup goals)."""

    def make_file(self, f: Path) -> None:
        f.mkdir(parents=True, exist_ok=True)

    def is_made(self) -> bool:
        return all(f.is_dir() for f in self._files)

    def clean_this(self) -> None:
        pass


class Maker:
    """Goal registry + make/clean entry points (ref: base make/Maker.java)."""

    def __init__(self):
        self.goals: dict[str, Goal] = {}

    def register(self, goal: Goal) -> Goal:
        if goal.name in self.goals:
            raise ValueError(f"Duplicate goal name: {goal.name}")
        self.goals[goal.name] = goal
        return goal

    def goal(self, name: str) -> Goal:
        g = self.goals.get(name)
        if g is None:
            raise KeyError(f"Unknown goal: {name}")
        return g

    def make(self, *names: str, isolate: bool = False) -> None:
        """Make the named goals. By default they are wrapped in a transient
        aggregating goal so shared ObjectGoal values stay alive across all
        targets; with isolate=True (CLI -i) each goal is made independently
        and memory is released between them (ref Maker.java:195-243)."""
        if isolate or len(names) <= 1:
            for n in names:
                self.goal(n).make()
            return
        internal = Goal(None, "__internal__", [self.goal(n) for n in names])
        internal.is_made = lambda: False
        try:
            internal.make()
        finally:
            # detach so registered goals don't accumulate dead dependents
            for d in internal.deps:
                d.dependents.remove(internal)

    def clean(self, *names: str) -> None:
        for n in names:
            self.goal(n).clean()

    def clean_all(self, *names: str) -> None:
        for n in names:
            self.goal(n).clean_all(False)

    def clean_total(self, *names: str) -> None:
        for n in names:
            self.goal(n).clean_all(True)

    def dump_all(self) -> None:
        for g in self.goals.values():
            g.dump()

    def user_goals(self) -> list[str]:
        return [g.name for g in self.goals.values() if g.user_goal]
