"""Tenant packages — importing a tenant module registers its plug-ins
(reference: etl/tenants/)."""
