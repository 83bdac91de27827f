from duckpipe_spark.plans.audit import PlanAudit, audit_plan, explain_formatted

__all__ = ["PlanAudit", "audit_plan", "explain_formatted"]
