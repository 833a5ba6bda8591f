/*
Reference-oracle harness (original code; part of the PySpark engine repo).

Drives the *actual* reference reasoning core (compiled unmodified from
/root/reference/src/lib — see tools/refbuild/build_oracle.sh) through its
public C++ API, so pytest can gate the Spark engine's emitted triples
against the reference engine itself (P/R >= 0.95 contract; VERDICT r1 #9).

The reference's own script frontend (.zph files) is Janet-transpiled
(command_executor.cpp:994 parse_zelph_to_janet) and Janet cannot be built
offline, so this harness replaces only the *surface syntax*: a line-based
DSL is translated into exactly the API calls the Janet layer makes —
facts via Zelph::fact (zelph.cpp:471), rules via set() + (set ~ Conjunction)
+ (set => consequence) exactly as script_engine.cpp:1299-1308, single-
condition rules directly as (cond => consequence) (wikidata.zph "Single
rules" comment). The reasoning run (Reasoning::run, reasoning.cpp) and the
final network state are 100% reference code.

DSL (argv[1], whitespace-tokenized, '#' comments):
  lang <lang>                         set current language
  name <token> <name>                 set_name(resolve(token), name, lang)
  fact <s> <p> <o> [prob]             assert a triple
  rule <c:s c:p c:o> [| <c2..>] => <d:s d:p d:o> [| <d2..>]
                                      '?X' tokens are per-rule variables;
                                      a condition may be prefixed 'not'
                                      (NAF, tags (cond ~ Negation));
                                      consequence '!' = core.Contradiction
  merge <from> <intoName>             set_name(from, intoName, lang, merge)
                                      -> Network::merge canonicalization
  trusted <s> <p> <o>                 bulk-import path (trusted insert)
  time <label>                        print "TIME <label> <sec since last>"
                                      to stderr (throughput benchmarking)
  run                                 Reasoning::run (semi-naive fixpoint)
  dump                                print final facts as TSV to stdout

Core-glyph tokens: ~ (IsA) => (Causes) ! (Contradiction) != (Unequal)
-> (RelationTypeCategory) in (PartOf).

Dump format, between ===DUMP=== / ===END=== markers:
  subj \t pred \t obj \t prob
one line per (fact, object); components render as the current-lang name,
a core glyph, or _n<id> for unnamed nodes (conjunction sets, vars get _v<k>).
Facts containing variables (rule machinery) are dumped with _v markers so
the Python side can filter rule infrastructure from data triples.
*/

#include "network/reasoning.hpp"
#include "network/network_types.hpp"
#include "wikidata/wikidata.hpp"

#include <chrono>
#include <fstream>
#include <iostream>
#include <map>
#include <sstream>
#include <string>
#include <unordered_map>
#include <vector>

using zelph::network::Node;
using zelph::network::Reasoning;
using zelph::network::adjacency_set;

namespace
{
    Reasoning* Z = nullptr;

    std::unordered_map<std::string, Node> glyphs;

    Node resolve(const std::string& tok, std::map<std::string, Node>* rule_vars)
    {
        auto g = glyphs.find(tok);
        if (g != glyphs.end()) return g->second;
        if (rule_vars && tok.size() > 1 && tok[0] == '?')
        {
            auto it = rule_vars->find(tok);
            if (it != rule_vars->end()) return it->second;
            Node v = Z->var();
            (*rule_vars)[tok] = v;
            return v;
        }
        return Z->node(tok);
    }

    std::vector<std::string> tokens(const std::string& line)
    {
        std::vector<std::string> out;
        std::istringstream       in(line);
        std::string              t;
        while (in >> t)
        {
            if (!t.empty() && t[0] == '#') break;
            out.push_back(t);
        }
        return out;
    }

    std::string render(Node n)
    {
        if (Reasoning::is_var(n)) return "_v" + std::to_string(~n);
        for (const auto& [glyph, node] : glyphs)
            if (node == n && glyph != "in") // PartOf shares no name below
            {
                // prefer an explicit name if the script set one
                std::string nm = Z->get_name(n, Z->lang(), false);
                return nm.empty() ? glyph : nm;
            }
        std::string nm = Z->get_name(n, Z->lang(), false);
        return nm.empty() ? "_n" + std::to_string(n) : nm;
    }

    void dump()
    {
        std::cout << "===DUMP===\n";
        auto view = Z->get_all_nodes_view();
        for (auto it = view.begin(); it != view.end(); ++it)
        {
            Node f = it->first;
            if (!Reasoning::is_hash(f)) continue;
            auto c = Z->extract_fact_components(f);
            if (!c.subject || !c.predicate) continue;
            const long double prob = Z->edge_weight(f, c.predicate, 1.0);
            // self-facts (S P S) have no object edge distinct from the
            // subject edge (zelph.cpp:515-521) -> empty objects; render in
            // the verbose "S P S" form (zelph.hpp:176-183)
            if (c.objects.empty())
            {
                std::cout << render(c.subject) << '\t' << render(c.predicate)
                          << '\t' << render(c.subject) << '\t'
                          << static_cast<double>(prob) << '\n';
            }
            for (Node o : c.objects)
            {
                std::cout << render(c.subject) << '\t' << render(c.predicate)
                          << '\t' << render(o) << '\t'
                          << static_cast<double>(prob) << '\n';
            }
        }
        std::cout << "===END===" << std::endl;
    }

    // split "a b c | d e f => g h i" on a separator token
    std::vector<std::vector<std::string>> split_on(
        const std::vector<std::string>& toks, size_t from, size_t to,
        const std::string& sep)
    {
        std::vector<std::vector<std::string>> out(1);
        for (size_t i = from; i < to; ++i)
        {
            if (toks[i] == sep)
                out.emplace_back();
            else
                out.back().push_back(toks[i]);
        }
        return out;
    }

    void add_rule(const std::vector<std::string>& toks)
    {
        size_t arrow = 0;
        for (size_t i = 1; i < toks.size(); ++i)
            if (toks[i] == "=>") arrow = i;
        if (!arrow) throw std::runtime_error("rule without =>");

        std::map<std::string, Node> vars;
        std::unordered_set<Node>    conds;
        for (auto& c : split_on(toks, 1, arrow, "|"))
        {
            // NAF sugar: "not s p o" tags the condition (cond ~ Negation),
            // exactly script_engine.cpp:1247
            bool neg = !c.empty() && c[0] == "not";
            if (neg) c.erase(c.begin());
            if (c.size() != 3) throw std::runtime_error("condition arity != 3");
            Node cond = Z->fact(resolve(c[0], &vars), resolve(c[1], &vars),
                                {resolve(c[2], &vars)});
            if (neg) Z->fact(cond, Z->core.IsA, {Z->core.Negation});
            conds.insert(cond);
        }
        // exactly script_engine.cpp:1299-1308 (janet_cfun_zelph_rule):
        // conjunction set for >1 condition, bare condition node for 1
        Node condition;
        if (conds.size() == 1)
            condition = *conds.begin();
        else
        {
            condition = Z->set(conds);
            Z->fact(condition, Z->core.IsA, {Z->core.Conjunction});
        }
        // ONE multi-object Causes fact carries all consequences: deduce()
        // then processes them as a single deduction set with fresh-variable
        // bindings shared across consequences (consequences_already_exist
        // doc comment; reasoning_deduce.cpp:54-130). Janet's zelph/rule
        // instead links consequences via separate Causes facts — i.e.
        // separate rules with independent fresh variables; for multi-
        // consequence fresh rules the set form is the reference semantics
        // this harness exposes.
        adjacency_set consequences;
        for (auto& d : split_on(toks, arrow + 1, toks.size(), "|"))
        {
            if (d.size() == 1 && d[0] == "!")
                consequences.insert(Z->core.Contradiction);
            else if (d.size() == 3)
                consequences.insert(
                    Z->fact(resolve(d[0], &vars), resolve(d[1], &vars),
                            {resolve(d[2], &vars)}));
            else
                throw std::runtime_error("consequence arity != 3");
        }
        Z->fact(condition, Z->core.Causes, consequences);
    }
}

int main(int argc, char** argv)
{
    if (argc < 2)
    {
        std::cerr << "usage: zelph_oracle <script.dsl>\n";
        return 2;
    }
    Reasoning engine;
    Z = &engine;
    Z->set_lang("wikidata");

    glyphs = {
        {"~", Z->core.IsA},
        {"=>", Z->core.Causes},
        {"!", Z->core.Contradiction},
        {"!=", Z->core.Unequal},
        {"->", Z->core.RelationTypeCategory},
        {"in", Z->core.PartOf},
    };

    std::ifstream in(argv[1]);
    if (!in)
    {
        std::cerr << "cannot open " << argv[1] << "\n";
        return 2;
    }
    std::string line;
    while (std::getline(in, line))
    {
        auto t = tokens(line);
        if (t.empty()) continue;
        const std::string& cmd = t[0];
        try
        {
            if (cmd == "lang" && t.size() == 2)
                Z->set_lang(t[1]);
            else if (cmd == "name" && t.size() == 3)
                Z->set_name(resolve(t[1], nullptr), t[2], Z->lang(), false);
            else if (cmd == "fact" && (t.size() == 4 || t.size() == 5))
            {
                long double p = t.size() == 5 ? std::stold(t[4]) : 1.0L;
                Z->fact(resolve(t[1], nullptr), resolve(t[2], nullptr),
                        {resolve(t[3], nullptr)}, p);
            }
            else if (cmd == "trusted" && t.size() == 4)
                // the reference's bulk-import path (wikidata.cpp import
                // uses this; the published facts/s numbers measure it)
                Z->fact_import_trusted_single_object(
                    resolve(t[1], nullptr), resolve(t[2], nullptr),
                    resolve(t[3], nullptr));
            else if (cmd == "time" && t.size() == 2)
            {
                static auto t_prev = std::chrono::steady_clock::now();
                auto        now    = std::chrono::steady_clock::now();
                std::cerr << "TIME " << t[1] << " "
                          << std::chrono::duration<double>(now - t_prev).count()
                          << "\n";
                t_prev = now;
            }
            else if (cmd == "rule")
                add_rule(t);
            else if (cmd == "import" && t.size() == 2)
            {
                // the reference Wikidata JSON-dump importer, end to end
                // (tag-scanning parser, trusted bulk insert, label names;
                // wikidata.cpp:103-360). Cache save at the end throws in
                // this build and is caught by the importer's own handler.
                zelph::wikidata::Wikidata wd(Z, t[1]);
                wd.import_all();
            }
            else if (cmd == "merge" && t.size() == 3)
                // canonicalization primitive: naming `from` with `into`'s
                // name merges the nodes (zelph_names.cpp merge_on_conflict;
                // Network::merge reconciles edge probabilities)
                Z->set_name(resolve(t[1], nullptr), t[2], Z->lang(), true);
            else if (cmd == "cluster" && t.size() == 2)
                // named workspace on: nodes created from here on are
                // recorded (network.hpp:675-692)
                Z->set_active_cluster(t[1]);
            else if (cmd == "nocluster" && t.size() == 1)
                Z->deactivate_cluster();
            else if (cmd == "dropcluster" && t.size() == 2)
                // destructive: removes recorded nodes + ALL their edges
                // (zelph_maintenance.cpp:162-181)
                std::cerr << "DROPPED " << Z->drop_cluster(t[1]) << "\n";
            else if (cmd == "mergecluster" && (t.size() == 2 || t.size() == 3))
                // to == "" merges into the default workspace
                Z->merge_cluster(t[1], t.size() == 3 ? t[2] : "");
            else if (cmd == "listclusters")
            {
                std::cout << "===CLUSTERS===\n";
                for (auto& [nm, n] : Z->list_clusters())
                    std::cout << nm << '\t' << n << '\n';
                std::cout << "===ENDCLUSTERS===" << std::endl;
            }
            else if (cmd == "run")
                // print deductions, no markdown, no repetition suppression
                Z->run(true, false, false, false);
            else if (cmd == "dump")
                dump();
            else if (cmd == "closure" && t.size() == 3)
            {
                // C1 transitive closure: Zelph::transitive_targets
                // (zelph.cpp:267-281, bfs_over_index path)
                auto reach = Z->transitive_targets(
                    resolve(t[1], nullptr), resolve(t[2], nullptr), false);
                std::cout << "===CLOSURE===\n";
                for (Node n : reach) std::cout << render(n) << '\n';
                std::cout << "===ENDCLOSURE===" << std::endl;
            }
            else if (cmd == "dumpnames" && t.size() == 2)
            {
                // (wikidata id, name in requested lang) pairs — label
                // import parity (zelph_names.cpp set_name semantics)
                std::cout << "===NAMES===\n";
                auto view = Z->get_lang_nodes_view(t[1]);
                for (auto it = view.begin(); it != view.end(); ++it)
                {
                    std::cout << Z->get_name(it->second, "wikidata", false)
                              << '\t' << std::string(it->first) << '\n';
                }
                std::cout << "===ENDNAMES===" << std::endl;
            }
            else
            {
                std::cerr << "bad line: " << line << "\n";
                return 2;
            }
        }
        catch (const std::exception& e)
        {
            std::cerr << "error on line '" << line << "': " << e.what() << "\n";
            return 1;
        }
    }
    return 0;
}
