// Native AMPL .nl reader (text format "g").
//
// TPU-native replacement for the IO half of the reference's ASL bindings
// (/root/reference/bindings/AMPL/AMPLModel.cpp:19-80 — ASL_alloc/pfgh_read):
// parses the .nl expression graphs into flat postfix token streams plus
// bounds/linear-part arrays.  Differentiation is NOT done here (ASL computes
// derivatives in C); instead the Python side replays the postfix programs
// under JAX tracing, so gradients/Jacobians/Hessians come from jax AD and
// fuse into the solver's XLA program.
//
// Exposed as a C API consumed via ctypes (no pybind11 in this environment).
//
// Build:  g++ -O2 -shared -fPIC -o libnlread.so nlread.cpp

#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <cmath>
#include <string>
#include <vector>

namespace {

struct Token {
    int32_t op;    // >=0: ASL opcode; -1: const; -2: variable reference
    double num;    // const value / variable index / n-ary arity
};

struct Parser {
    FILE* f = nullptr;
    std::string err;

    bool fail(const std::string& msg) {
        if (err.empty()) err = msg;
        return false;
    }

    // read one whitespace/newline-delimited token
    bool next(std::string& out) {
        out.clear();
        int c;
        while ((c = fgetc(f)) != EOF) {
            if (c == '#') {                 // comment to end of line
                while ((c = fgetc(f)) != EOF && c != '\n') {}
                if (!out.empty()) return true;
                continue;
            }
            if (isspace(c)) {
                if (!out.empty()) return true;
                continue;
            }
            out.push_back(static_cast<char>(c));
        }
        return !out.empty();
    }

    bool next_int(long& v) {
        std::string s;
        if (!next(s)) return fail("unexpected EOF (int)");
        v = strtol(s.c_str(), nullptr, 10);
        return true;
    }

    bool next_double(double& v) {
        std::string s;
        if (!next(s)) return fail("unexpected EOF (double)");
        v = strtod(s.c_str(), nullptr);
        return true;
    }

    // parse one prefix expression, emit postfix into out
    bool parse_expr(std::vector<Token>& out) {
        std::string t;
        if (!next(t)) return fail("unexpected EOF (expr)");
        char kind = t[0];
        if (kind == 'n') {                    // numeric constant
            out.push_back({-1, strtod(t.c_str() + 1, nullptr)});
            return true;
        }
        if (kind == 'v') {                    // variable (or defined variable)
            out.push_back({-2, static_cast<double>(strtol(t.c_str() + 1, nullptr, 10))});
            return true;
        }
        if (kind != 'o') return fail("unexpected token '" + t + "' in expression");
        long op = strtol(t.c_str() + 1, nullptr, 10);
        int arity;
        switch (op) {
            // unary
            case 13: case 14: case 15: case 16: case 34:
            case 37: case 38: case 39: case 40: case 41: case 42: case 43:
            case 44: case 45: case 46: case 47: case 49: case 50: case 51:
            case 52: case 53: case 76: case 77: case 78:
                arity = 1; break;
            // binary
            case 0: case 1: case 2: case 3: case 4: case 5: case 6:
            case 20: case 21: case 22: case 23: case 24: case 28: case 29:
            case 30: case 48: case 55:
                arity = 2; break;
            case 35:                          // if-then-else
                arity = 3; break;
            case 11: case 12: case 54: {      // min/max/sum lists
                long count;
                if (!next_int(count)) return false;
                for (long i = 0; i < count; ++i)
                    if (!parse_expr(out)) return false;
                out.push_back({static_cast<int32_t>(op), static_cast<double>(count)});
                return true;
            }
            default:
                return fail("unsupported opcode o" + std::to_string(op));
        }
        for (int i = 0; i < arity; ++i)
            if (!parse_expr(out)) return false;
        out.push_back({static_cast<int32_t>(op), 0.0});
        return true;
    }
};

}  // namespace

extern "C" {

struct NLData {
    int32_t n_vars, n_cons, n_objs, n_defined;
    int32_t objective_sense;      // 0 = minimize, 1 = maximize
    double *x_lb, *x_ub, *c_lb, *c_ub, *x0, *y0;
    int32_t jac_nnz; int32_t *jac_row, *jac_col; double* jac_val;
    int32_t grad_nnz; int32_t *grad_col; double* grad_val;
    int32_t n_tokens; int32_t* tok_op; double* tok_num;
    int32_t *con_expr_off;        // [n_cons + 1]
    int32_t *obj_expr_off;        // [2]
    int32_t *def_expr_off;        // [n_defined + 1]
    int32_t *def_index;           // [n_defined] variable index of each defined var
    int32_t deflin_nnz; int32_t *deflin_def, *deflin_col; double* deflin_val;
    char error[512];
};

static double* dup_vec(const std::vector<double>& v) {
    double* p = static_cast<double*>(malloc(sizeof(double) * (v.empty() ? 1 : v.size())));
    memcpy(p, v.data(), sizeof(double) * v.size());
    return p;
}
static int32_t* dup_ivec(const std::vector<int32_t>& v) {
    int32_t* p = static_cast<int32_t*>(malloc(sizeof(int32_t) * (v.empty() ? 1 : v.size())));
    memcpy(p, v.data(), sizeof(int32_t) * v.size());
    return p;
}

NLData* nl_parse(const char* path) {
    NLData* d = static_cast<NLData*>(calloc(1, sizeof(NLData)));
    Parser P;
    P.f = fopen(path, "rb");
    if (!P.f) {
        snprintf(d->error, sizeof(d->error), "cannot open %s", path);
        return d;
    }

    // ---- header ----
    // line 1: "g..." possibly with extra ints; must be text format
    {
        int c = fgetc(P.f);
        if (c != 'g') {
            snprintf(d->error, sizeof(d->error),
                     "only text-format (.nl written with 'g') is supported");
            fclose(P.f);
            return d;
        }
        while ((c = fgetc(P.f)) != EOF && c != '\n') {}
    }
    long nv = 0, nc = 0, no = 0, nrange = 0, neq = 0;
    {
        // header lines 2..10: read whole lines (robust to per-line field-count
        // variations between AMPL versions); line 2 starts with
        // "vars constraints objectives ranges eqns"
        char buf[1024];
        for (int line = 2; line <= 10; ++line) {
            if (!fgets(buf, sizeof(buf), P.f)) {
                snprintf(d->error, sizeof(d->error), "truncated .nl header");
                goto done;
            }
            if (line == 2) {
                if (sscanf(buf, " %ld %ld %ld %ld %ld", &nv, &nc, &no,
                           &nrange, &neq) < 3) {
                    snprintf(d->error, sizeof(d->error), "bad .nl header line 2");
                    goto done;
                }
            }
        }
    }

    {
        std::vector<double> x_lb(nv, -INFINITY), x_ub(nv, INFINITY);
        std::vector<double> c_lb(nc, -INFINITY), c_ub(nc, INFINITY);
        std::vector<double> x0(nv, 0.0), y0(nc, 0.0);
        std::vector<int32_t> jr, jc; std::vector<double> jv;
        std::vector<int32_t> gc; std::vector<double> gv;
        std::vector<Token> toks;
        std::vector<int32_t> con_off(nc + 1, 0), obj_off(2, 0);
        std::vector<int32_t> def_off{0};
        std::vector<int32_t> def_index;
        std::vector<int32_t> dl_def, dl_col; std::vector<double> dl_val;
        std::vector<std::vector<Token>> con_exprs(nc), obj_exprs(1);
        std::vector<std::vector<Token>> def_exprs;
        d->objective_sense = 0;

        std::string seg;
        while (P.next(seg)) {
            char k = seg[0];
            const char* rest = seg.c_str() + 1;
            if (k == 'C') {
                long i = strtol(rest, nullptr, 10);
                if (i < 0 || i >= nc) { P.fail("bad C index"); goto emit; }
                if (!P.parse_expr(con_exprs[i])) goto emit;
            } else if (k == 'O') {
                long i = strtol(rest, nullptr, 10);
                long sense;
                if (!P.next_int(sense)) goto emit;
                if (i == 0) d->objective_sense = static_cast<int32_t>(sense);
                std::vector<Token> tmp;
                if (!P.parse_expr(tmp)) goto emit;
                if (i == 0) obj_exprs[0] = std::move(tmp);
            } else if (k == 'V') {
                // defined variable: "V<idx> <nlin> <where>" + linear part + expr
                long idx = strtol(rest, nullptr, 10);
                long nlin, where;
                if (!P.next_int(nlin) || !P.next_int(where)) goto emit;
                for (long t = 0; t < nlin; ++t) {
                    long col; double val;
                    if (!P.next_int(col) || !P.next_double(val)) goto emit;
                    dl_def.push_back(static_cast<int32_t>(def_index.size()));
                    dl_col.push_back(static_cast<int32_t>(col));
                    dl_val.push_back(val);
                }
                std::vector<Token> tmp;
                if (!P.parse_expr(tmp)) goto emit;
                def_index.push_back(static_cast<int32_t>(idx));
                def_exprs.push_back(std::move(tmp));
            } else if (k == 'b') {
                for (long i = 0; i < nv; ++i) {
                    long code;
                    if (!P.next_int(code)) goto emit;
                    double lo, hi;
                    switch (code) {
                        case 0: if (!P.next_double(lo) || !P.next_double(hi)) goto emit;
                                x_lb[i] = lo; x_ub[i] = hi; break;
                        case 1: if (!P.next_double(hi)) goto emit; x_ub[i] = hi; break;
                        case 2: if (!P.next_double(lo)) goto emit; x_lb[i] = lo; break;
                        case 3: break;
                        case 4: if (!P.next_double(lo)) goto emit;
                                x_lb[i] = x_ub[i] = lo; break;
                        default: P.fail("unsupported bound code in b"); goto emit;
                    }
                }
            } else if (k == 'r') {
                for (long i = 0; i < nc; ++i) {
                    long code;
                    if (!P.next_int(code)) goto emit;
                    double lo, hi;
                    switch (code) {
                        case 0: if (!P.next_double(lo) || !P.next_double(hi)) goto emit;
                                c_lb[i] = lo; c_ub[i] = hi; break;
                        case 1: if (!P.next_double(hi)) goto emit; c_ub[i] = hi; break;
                        case 2: if (!P.next_double(lo)) goto emit; c_lb[i] = lo; break;
                        case 3: break;
                        case 4: if (!P.next_double(lo)) goto emit;
                                c_lb[i] = c_ub[i] = lo; break;
                        default: P.fail("unsupported bound code in r"); goto emit;
                    }
                }
            } else if (k == 'x') {
                long count = strtol(rest, nullptr, 10);
                for (long t = 0; t < count; ++t) {
                    long idx; double val;
                    if (!P.next_int(idx) || !P.next_double(val)) goto emit;
                    if (idx >= 0 && idx < nv) x0[idx] = val;
                }
            } else if (k == 'd') {
                long count = strtol(rest, nullptr, 10);
                for (long t = 0; t < count; ++t) {
                    long idx; double val;
                    if (!P.next_int(idx) || !P.next_double(val)) goto emit;
                    if (idx >= 0 && idx < nc) y0[idx] = val;
                }
            } else if (k == 'k') {
                long count = strtol(rest, nullptr, 10);
                long dummy;
                for (long t = 0; t < count; ++t)
                    if (!P.next_int(dummy)) goto emit;
            } else if (k == 'J') {
                long i = strtol(rest, nullptr, 10);
                long count;
                if (!P.next_int(count)) goto emit;
                for (long t = 0; t < count; ++t) {
                    long col; double val;
                    if (!P.next_int(col) || !P.next_double(val)) goto emit;
                    jr.push_back(static_cast<int32_t>(i));
                    jc.push_back(static_cast<int32_t>(col));
                    jv.push_back(val);
                }
            } else if (k == 'G') {
                long i = strtol(rest, nullptr, 10);
                long count;
                if (!P.next_int(count)) goto emit;
                for (long t = 0; t < count; ++t) {
                    long col; double val;
                    if (!P.next_int(col) || !P.next_double(val)) goto emit;
                    if (i == 0) {
                        gc.push_back(static_cast<int32_t>(col));
                        gv.push_back(val);
                    }
                }
            } else if (k == 'S') {
                // suffix: "S<kind> <n> <name>" + n (idx, value) pairs; skip
                long kind_unused = strtol(rest, nullptr, 10);
                (void)kind_unused;
                long count; std::string name;
                if (!P.next_int(count) || !P.next(name)) goto emit;
                for (long t = 0; t < count; ++t) {
                    long idx; double val;
                    if (!P.next_int(idx) || !P.next_double(val)) goto emit;
                }
            } else if (k == 'F' || k == 'L') {
                P.fail(std::string("unsupported segment '") + k + "'");
                goto emit;
            } else {
                P.fail("unknown segment '" + seg + "'");
                goto emit;
            }
        }

    emit:
        // flatten expressions into one token stream with offsets
        for (long i = 0; i < nc; ++i) {
            con_off[i] = static_cast<int32_t>(toks.size());
            toks.insert(toks.end(), con_exprs[i].begin(), con_exprs[i].end());
        }
        con_off[nc] = static_cast<int32_t>(toks.size());
        obj_off[0] = static_cast<int32_t>(toks.size());
        toks.insert(toks.end(), obj_exprs[0].begin(), obj_exprs[0].end());
        obj_off[1] = static_cast<int32_t>(toks.size());
        for (auto& e : def_exprs) {
            def_off.push_back(0);  // placeholder, fixed below
            (void)e;
        }
        def_off.assign(1, static_cast<int32_t>(toks.size()));
        for (auto& e : def_exprs) {
            toks.insert(toks.end(), e.begin(), e.end());
            def_off.push_back(static_cast<int32_t>(toks.size()));
        }
        // def_off currently starts at first defined expr; prepend explicit start
        // (def_off[0] is the start of defined expr 0)

        d->n_vars = static_cast<int32_t>(nv);
        d->n_cons = static_cast<int32_t>(nc);
        d->n_objs = static_cast<int32_t>(no);
        d->n_defined = static_cast<int32_t>(def_exprs.size());
        d->x_lb = dup_vec(x_lb); d->x_ub = dup_vec(x_ub);
        d->c_lb = dup_vec(c_lb); d->c_ub = dup_vec(c_ub);
        d->x0 = dup_vec(x0); d->y0 = dup_vec(y0);
        d->jac_nnz = static_cast<int32_t>(jv.size());
        d->jac_row = dup_ivec(jr); d->jac_col = dup_ivec(jc); d->jac_val = dup_vec(jv);
        d->grad_nnz = static_cast<int32_t>(gv.size());
        d->grad_col = dup_ivec(gc); d->grad_val = dup_vec(gv);
        d->n_tokens = static_cast<int32_t>(toks.size());
        {
            std::vector<int32_t> ops(toks.size());
            std::vector<double> nums(toks.size());
            for (size_t i = 0; i < toks.size(); ++i) {
                ops[i] = toks[i].op;
                nums[i] = toks[i].num;
            }
            d->tok_op = dup_ivec(ops);
            d->tok_num = dup_vec(nums);
        }
        d->con_expr_off = dup_ivec(con_off);
        d->obj_expr_off = dup_ivec(obj_off);
        d->def_expr_off = dup_ivec(def_off);
        d->def_index = dup_ivec(def_index);
        d->deflin_nnz = static_cast<int32_t>(dl_val.size());
        d->deflin_def = dup_ivec(dl_def);
        d->deflin_col = dup_ivec(dl_col);
        d->deflin_val = dup_vec(dl_val);
        if (!P.err.empty())
            snprintf(d->error, sizeof(d->error), "%s", P.err.c_str());
    }

done:
    if (P.f) fclose(P.f);
    if (d->error[0] == 0 && !P.err.empty())
        snprintf(d->error, sizeof(d->error), "%s", P.err.c_str());
    return d;
}

void nl_free(NLData* d) {
    if (!d) return;
    free(d->x_lb); free(d->x_ub); free(d->c_lb); free(d->c_ub);
    free(d->x0); free(d->y0);
    free(d->jac_row); free(d->jac_col); free(d->jac_val);
    free(d->grad_col); free(d->grad_val);
    free(d->tok_op); free(d->tok_num);
    free(d->con_expr_off); free(d->obj_expr_off); free(d->def_expr_off);
    free(d->def_index);
    free(d->deflin_def); free(d->deflin_col); free(d->deflin_val);
    free(d);
}

}  // extern "C"
