"""dbt-style template compilation for the SQL model layer (SURVEY §2.8
U5) — the Jinja subset dbt models actually use, compiled down to
:class:`~dagster_etl_spark.plans.sql_models.SqlModelProject`.

Reference: etl/tenants/*/dbt/models/*.sql templates are Jinja with
``{{ ref('model') }}`` / ``{{ source('schema', 'table') }}`` calls
(e.g. project_01/dbt/models/staging/stg_cfg_item_master.sql:5,
transform/tfm_item_master_enriched.sql:5), resolved by ``dbt build``
(etl/factories/dbt_factory.py:102-147); the project scaffold carries a
``macros/`` dir. This module implements that surface without Jinja:

* ``{{ ref('m') }}``      -> the model's view name, AND the dependency
  edge (auto-derived like dbt — no hand-maintained depends_on);
* ``{{ source(s, t) }}``  -> the registered source table for (s, t);
* ``{{ var('k', d) }}``   -> project var with optional default;
* ``{{ config(materialized='table') }}`` -> materialization, stripped
  from the SQL;
* ``{% macro name(a, b='x') %}...{% endmacro %}`` definitions and
  ``{{ name(...) }}`` calls — positional/keyword/default args,
  recursive expansion (bounded), parameters referenced in the body as
  ``{{ a }}``.

Deliberately NOT a Jinja engine: no loops/conditionals/filters — the
subset above covers every construct in the reference's model tree and
typical macro usage; anything else raises loudly rather than silently
passing ``{{ ... }}`` into Spark SQL.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from dagster_etl_spark.plans.sql_models import ColumnTest, SqlModelProject

_MACRO_DEF = re.compile(
    r"\{%-?\s*macro\s+(\w+)\s*\(([^)]*)\)\s*-?%\}(.*?)\{%-?\s*endmacro\s*-?%\}",
    re.S,
)
_CALL = re.compile(r"\{\{-?\s*(\w+)\s*\(([^{}]*)\)\s*-?\}\}")
_PARAM = re.compile(r"\{\{-?\s*(\w+)\s*-?\}\}")
_INCR_IF = re.compile(
    r"\{%-?\s*if\s+is_incremental\(\)\s*-?%\}(.*?)\{%-?\s*endif\s*-?%\}", re.S
)
_MAX_DEPTH = 10


@dataclass(frozen=True)
class MacroDef:
    name: str
    params: tuple[tuple[str, str | None], ...]  # (name, default literal or None)
    body: str


def parse_macros(text: str) -> dict[str, MacroDef]:
    """Extract ``{% macro %}`` definitions from a macros file (the
    analog of the reference's dbt ``macros/`` dir)."""
    out: dict[str, MacroDef] = {}
    for m in _MACRO_DEF.finditer(text):
        name, raw_params, body = m.group(1), m.group(2), m.group(3).strip()
        params: list[tuple[str, str | None]] = []
        for p in _split_args(raw_params):
            if not p:
                continue
            if "=" in p:
                pname, default = p.split("=", 1)
                params.append((pname.strip(), _literal(default.strip())))
            else:
                params.append((p.strip(), None))
        out[name] = MacroDef(name, tuple(params), body)
    return out


def _split_args(raw: str) -> list[str]:
    """Split a call's argument list on commas outside quotes."""
    args, buf, quote = [], [], None
    for ch in raw:
        if quote:
            buf.append(ch)
            if ch == quote:
                quote = None
        elif ch in "'\"":
            buf.append(ch)
            quote = ch
        elif ch == ",":
            args.append("".join(buf).strip())
            buf = []
        else:
            buf.append(ch)
    tail = "".join(buf).strip()
    if tail:
        args.append(tail)
    return args


def _literal(tok: str) -> str:
    """A call-site argument: quoted string -> its content, anything
    else (numbers, bare SQL snippets) -> verbatim text."""
    if len(tok) >= 2 and tok[0] == tok[-1] and tok[0] in "'\"":
        return tok[1:-1]
    return tok


def _expand_body(body: str, bound: dict[str, str]) -> str:
    """Bind a macro's parameters into its body: ``{{ param }}`` splices
    the value; param names used as arguments of NESTED calls
    (``{{ other(param) }}``) are substituted word-wise inside the
    remaining ``{{ ... }}`` regions — the Jinja variable-scope behavior
    dbt macros rely on, without evaluating arbitrary expressions."""
    body = _PARAM.sub(lambda pm: bound.get(pm.group(1), pm.group(0)), body)

    def sub_region(rm: re.Match) -> str:
        inner = rm.group(1)
        for k, v in bound.items():
            inner = re.sub(rf"\b{re.escape(k)}\b", lambda _m: v, inner)
        return "{{" + inner + "}}"

    return re.sub(r"\{\{(.*?)\}\}", sub_region, body, flags=re.S)


@dataclass
class RenderResult:
    sql: str
    refs: tuple[str, ...]
    materialize: str | None = None
    config: dict[str, str] = field(default_factory=dict)


def render(
    template: str,
    sources: dict[tuple[str, str], str] | None = None,
    variables: dict[str, str] | None = None,
    macros: dict[str, MacroDef] | None = None,
    is_incremental: bool = False,
    this_name: str | None = None,
) -> RenderResult:
    """Compile one model template to runnable Spark SQL, collecting the
    auto-derived ``ref`` dependency edges and any ``config()``.

    ``is_incremental`` selects the dbt incremental-run variant: the
    bodies of ``{% if is_incremental() %} ... {% endif %}`` blocks are
    kept (dropped otherwise) and ``{{ this }}`` resolves to
    ``this_name`` — the view over the model's current materialization.
    """
    sources = sources or {}
    variables = variables or {}
    macros = dict(macros or {})
    macros.update(parse_macros(template))
    template = _MACRO_DEF.sub("", template)
    template = _INCR_IF.sub(lambda m: m.group(1) if is_incremental else "", template)
    if this_name is not None:
        template = re.sub(r"\{\{-?\s*this\s*-?\}\}", this_name, template)

    refs: list[str] = []
    materialize: list[str | None] = [None]
    config_kw: dict[str, str] = {}

    def resolve(m: re.Match) -> str:
        fn, raw_args = m.group(1), m.group(2)
        pos: list[str] = []
        kw: dict[str, str] = {}
        for a in _split_args(raw_args):
            if re.match(r"^\w+\s*=", a) and not a.lstrip().startswith(("'", '"')):
                k, v = a.split("=", 1)
                kw[k.strip()] = _literal(v.strip())
            elif a:
                pos.append(_literal(a))
        if fn == "ref":
            (name,) = pos
            if name not in refs:
                refs.append(name)
            return name
        if fn == "source":
            schema, table = pos
            try:
                return sources[(schema, table)]
            except KeyError:
                raise KeyError(
                    f"unknown source({schema!r}, {table!r}) — not registered "
                    "in the project's sources"
                ) from None
        if fn == "var":
            key = pos[0]
            if key in variables:
                return str(variables[key])
            if len(pos) > 1:
                return pos[1]
            raise KeyError(f"undeclared dbt var {key!r} with no default")
        if fn == "config":
            config_kw.update(kw)
            materialize[0] = kw.get("materialized", materialize[0])
            return ""
        if fn in macros:
            d = macros[fn]
            bound: dict[str, str] = {}
            for i, (pname, default) in enumerate(d.params):
                if i < len(pos):
                    bound[pname] = pos[i]
                elif pname in kw:
                    bound[pname] = kw[pname]
                elif default is not None:
                    bound[pname] = default
                else:
                    raise TypeError(f"macro {fn!r} missing argument {pname!r}")
            return _expand_body(d.body, bound)
        raise NameError(f"unknown template call {fn!r} in model SQL")

    sql = template
    for _ in range(_MAX_DEPTH):
        new = _CALL.sub(resolve, sql)
        if new == sql:
            break
        sql = new
    else:
        raise RecursionError("macro expansion exceeded depth limit")
    leftover = _PARAM.search(sql) or re.search(r"\{%", sql)
    if leftover:
        raise ValueError(
            f"unsupported template construct at {leftover.group(0)!r} "
            "(supported: ref/source/var/config/macro calls)"
        )
    return RenderResult(sql.strip(), tuple(refs), materialize[0], config_kw)


def parse_schema_yml(text: str) -> dict[str, tuple[ColumnTest, ...]]:
    """dbt ``schema.yml`` test declarations -> per-model ColumnTest
    tuples (reference: etl/tenants/project_01/dbt/models/transform/
    _transform__schema.yml — not_null / accepted_values on model
    columns). Supported test forms, exactly dbt's YAML shapes:

    * bare string: ``- not_null`` / ``- unique``
    * mapping: ``- accepted_values: {values: [a, b]}``

    Unknown test names raise (a typo'd test silently never failing is
    worse than an error); anything else in the file (descriptions,
    sources) is ignored like dbt does for execution purposes."""
    import yaml

    doc = yaml.safe_load(text) or {}
    out: dict[str, tuple[ColumnTest, ...]] = {}
    for model in doc.get("models", []) or []:
        tests: list[ColumnTest] = []
        for col in model.get("columns", []) or []:
            cname = col.get("name")
            for t in col.get("tests", []) or []:
                if isinstance(t, str):
                    name, cfg = t, {}
                elif isinstance(t, dict) and len(t) == 1:
                    name, cfg = next(iter(t.items()))
                    cfg = cfg or {}
                else:
                    raise ValueError(f"unparseable test entry {t!r} on {cname!r}")
                if name == "accepted_values":
                    tests.append(
                        ColumnTest(cname, name, tuple(cfg.get("values", ())))
                    )
                elif name in ("not_null", "unique"):
                    tests.append(ColumnTest(cname, name))
                else:
                    raise ValueError(
                        f"unknown schema test {name!r} on column {cname!r} "
                        "(supported: not_null, unique, accepted_values)"
                    )
        if tests:
            out[model["name"]] = tuple(tests)
    return out


@dataclass
class DbtProject:
    """A tenant's templated model tree: the dbt-shaped front end whose
    ``compile()`` emits the engine's SqlModelProject with dependencies
    auto-derived from ``ref()`` calls — build order, materialization
    and hard-fail schema tests all come from the existing layer."""

    models: dict[str, str] = field(default_factory=dict)
    sources: dict[tuple[str, str], str] = field(default_factory=dict)
    variables: dict[str, str] = field(default_factory=dict)
    macros_sql: str = ""
    tests: dict[str, tuple[ColumnTest, ...]] = field(default_factory=dict)

    def add(self, name: str, template: str) -> "DbtProject":
        self.models[name] = template
        return self

    def with_schema_yml(self, text: str) -> "DbtProject":
        """Attach a dbt ``schema.yml``: its declared column tests merge
        into the project's hard-fail test gate (tests for models not in
        this project are validated at compile time)."""
        self.tests.update(parse_schema_yml(text))
        return self

    def compile(self) -> SqlModelProject:
        macros = parse_macros(self.macros_sql)
        untargeted = [m for m in self.tests if m not in self.models]
        if untargeted:
            raise KeyError(
                f"schema tests declared for unknown model(s) {untargeted}"
            )
        project = SqlModelProject()
        for name, template in self.models.items():
            r = render(template, self.sources, self.variables, macros)
            incremental_sql = None
            unique_key: tuple[str, ...] = ()
            depends_on = list(r.refs)
            if r.materialize == "incremental":
                # dbt's incremental contract: the second variant keeps
                # {% if is_incremental() %} blocks and sees {{ this }}
                # as the model's current materialization
                ri = render(
                    template,
                    self.sources,
                    self.variables,
                    macros,
                    is_incremental=True,
                    this_name=f"{name}__current",
                )
                incremental_sql = ri.sql
                # deps come from BOTH render branches: a ref() that only
                # appears inside {% if is_incremental() %} must still
                # order/validate the build (dbt derives deps all-branch)
                depends_on += [d for d in ri.refs if d not in depends_on]
                key = r.config.get("unique_key", "")
                unique_key = tuple(k.strip() for k in key.split(",") if k.strip())
                if not unique_key:
                    raise ValueError(
                        f"incremental model {name!r} needs config(unique_key=...)"
                    )
            unknown = [d for d in depends_on if d not in self.models]
            if unknown:
                raise KeyError(f"model {name!r} refs unknown model(s) {unknown}")
            project.add(
                name,
                r.sql,
                depends_on=tuple(depends_on),
                materialize=r.materialize or "view",
                tests=self.tests.get(name, ()),
                incremental_sql=incremental_sql,
                unique_key=unique_key,
            )
        return project
