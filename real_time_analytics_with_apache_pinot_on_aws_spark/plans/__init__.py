"""Physical-plan introspection and scale guardrails."""

from .audit import PlanFacts, audit_plan  # noqa: F401
