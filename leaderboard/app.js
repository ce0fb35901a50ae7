/* RecBoard-TPU leaderboard app.
 *
 * Functional equivalent of the reference's React components
 * (recboard/src/components/{LeaderboardTable,ExpandedRow,
 * DatasetSelector,DatasetInfo,TagFilter}.tsx) without a build chain:
 * loads results.json (written by `python -m recboard_tpu.benchmark`),
 * renders a sortable per-dataset table with tag filters and expandable
 * per-seed rows.
 */
"use strict";

const state = { data: null, dataset: null, sortBy: null, sortDir: -1, tags: new Set() };

const fmt = (x) => (x == null ? "—" : x.toFixed(4));

async function boot() {
  const resp = await fetch("results.json");
  state.data = await resp.json();
  const names = Object.keys(state.data.datasets);
  const sel = document.getElementById("dataset");
  for (const name of names) {
    const opt = document.createElement("option");
    opt.value = opt.textContent = name;
    sel.appendChild(opt);
  }
  sel.onchange = () => { state.dataset = sel.value; state.tags.clear(); render(); };
  state.dataset = names[0];
  render();
}

function currentModels() {
  const ds = state.data.datasets[state.dataset];
  let models = ds.models;
  if (state.tags.size) {
    models = models.filter((m) => [...state.tags].every((t) => m.tags.includes(t)));
  }
  return models;
}

function metricColumns(models) {
  const core = (state.data.datasets[state.dataset].meta.core_metrics || [])
    .map((m) => m.toUpperCase().replace("HITRATE", "HITRATE"));
  const seen = new Set();
  for (const m of models) for (const k of Object.keys(m.metrics || {})) seen.add(k);
  const cols = [];
  for (const c of core.map((c) => c.toUpperCase())) if (seen.has(c)) cols.push(c);
  for (const k of [...seen].sort()) if (!cols.includes(k)) cols.push(k);
  return cols.slice(0, 8);
}

function render() {
  const ds = state.data.datasets[state.dataset];
  const meta = ds.meta || {};
  document.getElementById("meta").textContent = [
    meta.num_users && `${meta.num_users.toLocaleString()} users`,
    meta.num_items && `${meta.num_items.toLocaleString()} items`,
    meta.num_interactions && `${meta.num_interactions.toLocaleString()} interactions`,
    meta.build_command,
  ].filter(Boolean).join("  ·  ");

  const allTags = new Set();
  for (const m of ds.models) for (const t of m.tags) allTags.add(t);
  const tagBox = document.getElementById("tags");
  tagBox.innerHTML = "";
  for (const t of [...allTags].sort()) {
    const el = document.createElement("span");
    el.className = "tag" + (state.tags.has(t) ? " on" : "");
    el.textContent = t;
    el.onclick = () => { state.tags.has(t) ? state.tags.delete(t) : state.tags.add(t); render(); };
    tagBox.appendChild(el);
  }

  const models = currentModels();
  const cols = metricColumns(models);
  if (!state.sortBy || !cols.includes(state.sortBy)) {
    const pref = (meta.sort_by && meta.sort_by[0] && meta.sort_by[0][0]) || "NDCG@10";
    state.sortBy = cols.includes(pref.toUpperCase()) ? pref.toUpperCase() : cols[0];
  }
  models.sort((a, b) => {
    const av = a.metrics?.[state.sortBy]?.mean ?? -Infinity;
    const bv = b.metrics?.[state.sortBy]?.mean ?? -Infinity;
    return (av - bv) * state.sortDir;
  });

  const thead = document.querySelector("#board thead");
  thead.innerHTML = "";
  const hr = document.createElement("tr");
  hr.innerHTML = "<th class=rank>#</th><th>Model</th><th>Tags</th><th>Seeds</th>";
  for (const c of cols) {
    const th = document.createElement("th");
    th.innerHTML = c + (c === state.sortBy ? ` <span class=dir>${state.sortDir < 0 ? "▼" : "▲"}</span>` : "");
    th.onclick = () => {
      if (state.sortBy === c) state.sortDir *= -1; else { state.sortBy = c; state.sortDir = -1; }
      render();
    };
    hr.appendChild(th);
  }
  thead.appendChild(hr);

  const tbody = document.querySelector("#board tbody");
  tbody.innerHTML = "";
  models.forEach((m, i) => {
    const tr = document.createElement("tr");
    tr.className = "row";
    tr.innerHTML =
      `<td class=rank>${i + 1}</td><td><b>${m.model}</b></td>` +
      `<td>${m.tags.map((t) => `<span class=pill>${t}</span>`).join("")}</td>` +
      `<td>${m.num_runs}</td>` +
      cols.map((c) => {
        const v = m.metrics?.[c];
        return `<td>${v ? `${fmt(v.mean)} <span class=std>±${fmt(v.std)}</span>` : "—"}</td>`;
      }).join("");
    tr.onclick = () => toggleExpand(tr, m, cols.length + 4);
    tbody.appendChild(tr);
  });
}

function toggleExpand(tr, m, span) {
  const next = tr.nextSibling;
  if (next && next.classList && next.classList.contains("expand")) { next.remove(); return; }
  const ex = document.createElement("tr");
  ex.className = "expand";
  const seeds = (m.seeds || []).map((s) => `seed ${s}`).join(", ");
  ex.innerHTML = `<td colspan=${span}>` +
    `<b>${m.model}</b> — ${m.description || "no description"}<br>` +
    `runs: ${m.num_runs} (${seeds})<br>` +
    `recorded: ${m.timestamp}<br>` +
    Object.entries(m.metrics || {}).map(([k, v]) => `${k}: ${fmt(v.mean)} ± ${fmt(v.std)}`).join(" · ") +
    `</td>`;
  tr.after(ex);
}

boot();
