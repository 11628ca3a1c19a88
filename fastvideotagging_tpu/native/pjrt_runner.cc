// Native (C++) serving runner over the PJRT C API — run an exported
// StableHLO program on any PJRT plugin (the TPU plugin, libtpu, ...) with no
// Python in the process.
//
// This is the production deployment tier beyond the Python package
// (SURVEY.md L1 "core runtime"): evaluation/serving.py exports the full
// inference program (fused uint8 preprocess + backbone + head) as portable
// StableHLO; this binary dlopens a PJRT plugin, compiles that program, and
// executes it on raw input files. The Python side
// (fastvideotagging_tpu/native/__init__.py: build_pjrt_runner/run_serving)
// builds it on demand with g++ against the PJRT C API header and uses it in
// tests to cross-check outputs bit-for-bit against the in-process jax path.
//
// Usage (one-shot):
//   pjrt_runner --plugin libfoo_pjrt.so --module model.stablehlo.mlir \
//       --input u8:8,16,128,171,3:clips.bin [--input ...] \
//       --compile-options opts.pb --output out
//
// Writes one raw little-endian file per program output: out.0, out.1, ...
// and prints a one-line JSON summary to stdout.
//
// Usage (daemon): compile ONCE, then serve requests line-by-line from
// stdin — the long-running native deployment tier (a video front-end
// keeps this process warm instead of paying compile per batch):
//   pjrt_runner --plugin P.so --module M.mlir --serve \
//       --serve-input u8:8,16,128,171,3 [--serve-input ...] --output out
// After compiling it prints "ready" to stderr; each stdin line is
// whitespace-separated raw input file paths (one per --serve-input, in
// order); each request answers with one JSON line on stdout naming the
// output files (out.req<N>.<i>). A malformed request (missing/short
// file, wrong arg count) answers {"error": ...} and the daemon lives on.
//
// --pipeline K (serve mode): a stager thread reads + H2D-stages up to K
// requests ahead while the device executes the current one, so input
// staging hides behind compute when the client keeps >1 request in
// flight (NativeServer.request_many). Replies stay in request order.

#include <dlfcn.h>
#include <stdarg.h>
#include <stdint.h>
#include <stdio.h>
#include <stdlib.h>
#include <string.h>
#include <time.h>

#include <condition_variable>
#include <deque>
#include <mutex>
#include <string>
#include <thread>
#include <vector>

#include "xla/pjrt/c/pjrt_c_api.h"

namespace {

[[noreturn]] void Die(const char* fmt, ...) {
  va_list ap;
  va_start(ap, fmt);
  vfprintf(stderr, fmt, ap);
  fprintf(stderr, "\n");
  va_end(ap);
  exit(1);
}

const PJRT_Api* g_api = nullptr;

void Check(PJRT_Error* err, const char* what) {
  if (err == nullptr) return;
  PJRT_Error_Message_Args margs;
  memset(&margs, 0, sizeof(margs));
  margs.struct_size = PJRT_Error_Message_Args_STRUCT_SIZE;
  margs.error = err;
  g_api->PJRT_Error_Message(&margs);
  std::string msg(margs.message, margs.message_size);
  PJRT_Error_Destroy_Args dargs;
  memset(&dargs, 0, sizeof(dargs));
  dargs.struct_size = PJRT_Error_Destroy_Args_STRUCT_SIZE;
  dargs.error = err;
  g_api->PJRT_Error_Destroy(&dargs);
  Die("%s failed: %s", what, msg.c_str());
}

void AwaitEvent(PJRT_Event* event, const char* what) {
  PJRT_Event_Await_Args args;
  memset(&args, 0, sizeof(args));
  args.struct_size = PJRT_Event_Await_Args_STRUCT_SIZE;
  args.event = event;
  Check(g_api->PJRT_Event_Await(&args), what);
  PJRT_Event_Destroy_Args dargs;
  memset(&dargs, 0, sizeof(dargs));
  dargs.struct_size = PJRT_Event_Destroy_Args_STRUCT_SIZE;
  dargs.event = event;
  g_api->PJRT_Event_Destroy(&dargs);
}

std::string ReadFile(const std::string& path) {
  FILE* f = fopen(path.c_str(), "rb");
  if (!f) Die("cannot open %s", path.c_str());
  fseek(f, 0, SEEK_END);
  long n = ftell(f);
  fseek(f, 0, SEEK_SET);
  std::string out(n, '\0');
  if (n && fread(&out[0], 1, n, f) != (size_t)n) Die("short read: %s",
                                                     path.c_str());
  fclose(f);
  return out;
}

struct InputSpec {
  PJRT_Buffer_Type type;
  size_t elem_bytes;
  std::vector<int64_t> dims;
  std::string data;  // bench_n concatenated instances (empty in serve mode)
  size_t instance_bytes;
};

bool TryReadFile(const std::string& path, std::string* out) {
  FILE* f = fopen(path.c_str(), "rb");
  if (!f) return false;
  fseek(f, 0, SEEK_END);
  long n = ftell(f);
  fseek(f, 0, SEEK_SET);
  out->assign(n, '\0');
  bool ok = !n || fread(&(*out)[0], 1, n, f) == (size_t)n;
  fclose(f);
  return ok;
}

double NowSec() {
  struct timespec ts;
  clock_gettime(CLOCK_MONOTONIC, &ts);
  return ts.tv_sec + ts.tv_nsec * 1e-9;
}

PJRT_Buffer_Type ParseType(const std::string& s, size_t* elem_bytes) {
  if (s == "u8") { *elem_bytes = 1; return PJRT_Buffer_Type_U8; }
  if (s == "s32") { *elem_bytes = 4; return PJRT_Buffer_Type_S32; }
  if (s == "f32") { *elem_bytes = 4; return PJRT_Buffer_Type_F32; }
  if (s == "bf16") { *elem_bytes = 2; return PJRT_Buffer_Type_BF16; }
  if (s == "pred") { *elem_bytes = 1; return PJRT_Buffer_Type_PRED; }
  Die("unsupported input dtype %s (u8|s32|f32|bf16|pred)", s.c_str());
}

// "u8:8,16,128,171,3" -> shape-only InputSpec (serve mode).
InputSpec ParseShape(const std::string& spec) {
  size_t c1 = spec.find(':');
  if (c1 == std::string::npos)
    Die("bad input spec %s (want dtype:d0,d1,...)", spec.c_str());
  InputSpec in;
  in.type = ParseType(spec.substr(0, c1), &in.elem_bytes);
  std::string dims = spec.substr(c1 + 1);
  size_t pos = 0, n = 1;
  while (pos < dims.size()) {
    size_t comma = dims.find(',', pos);
    if (comma == std::string::npos) comma = dims.size();
    in.dims.push_back(atoll(dims.substr(pos, comma - pos).c_str()));
    n *= in.dims.back();
    pos = comma + 1;
  }
  in.instance_bytes = n * in.elem_bytes;
  return in;
}

// "u8:8,16,128,171,3:clips.bin" -> InputSpec. With bench_n > 1 the file
// holds bench_n CONCATENATED instances (distinct contents per instance —
// the runtime dedupes identical dispatches, so benchmark iterations must
// differ in content).
InputSpec ParseInput(const std::string& spec, size_t bench_n) {
  size_t c2 = spec.rfind(':');
  if (c2 == std::string::npos || spec.find(':') == c2)
    Die("bad --input %s (want dtype:d0,d1,...:file)", spec.c_str());
  InputSpec in = ParseShape(spec.substr(0, c2));
  in.data = ReadFile(spec.substr(c2 + 1));
  if (in.data.size() != in.instance_bytes * bench_n)
    Die("input file size %zu != expected %zu (x%zu instances) for %s",
        in.data.size(), in.instance_bytes, bench_n, spec.c_str());
  return in;
}

const char* TypeName(PJRT_Buffer_Type t) {
  switch (t) {
    case PJRT_Buffer_Type_U8: return "u8";
    case PJRT_Buffer_Type_S32: return "s32";
    case PJRT_Buffer_Type_F32: return "f32";
    case PJRT_Buffer_Type_BF16: return "bf16";
    case PJRT_Buffer_Type_PRED: return "pred";
    default: return "other";
  }
}

}  // namespace

int main(int argc, char** argv) {
  std::string plugin, module_path, out_prefix = "out", options_path;
  size_t bench_n = 1;
  long pipeline = 0;
  bool serve = false;
  std::vector<std::string> input_specs, serve_specs;
  // Plugin client-create options ("key=str:value" / "key=int:value") — some
  // plugins (e.g. pool-scheduled TPU plugins) require NamedValue options.
  std::vector<std::pair<std::string, std::string>> raw_opts;
  for (int i = 1; i < argc; ++i) {
    std::string a = argv[i];
    auto next = [&]() -> std::string {
      if (++i >= argc) Die("missing value for %s", a.c_str());
      return argv[i];
    };
    if (a == "--plugin") plugin = next();
    else if (a == "--module") module_path = next();
    else if (a == "--input") input_specs.push_back(next());
    else if (a == "--output") out_prefix = next();
    else if (a == "--compile-options") options_path = next();
    else if (a == "--bench") {
      bench_n = (size_t)atoll(next().c_str());
      // 1 warmup + disjoint short/long batches with n_long > n_short; fail
      // here, before any device buffers are staged.
      if (bench_n > 1 && bench_n < 6)
        Die("--bench needs >= 6 instances (1 warmup + short/long batches "
            "with a meaningful slope); got %zu", bench_n);
    }
    else if (a == "--serve") serve = true;
    else if (a == "--serve-input") serve_specs.push_back(next());
    else if (a == "--pipeline") {
      pipeline = atol(next().c_str());
      if (pipeline < 0) Die("--pipeline must be >= 0 (got %ld)", pipeline);
    }
    else if (a == "--client-option") {
      std::string kv = next();
      size_t eq = kv.find('=');
      if (eq == std::string::npos) Die("bad --client-option %s", kv.c_str());
      raw_opts.emplace_back(kv.substr(0, eq), kv.substr(eq + 1));
    } else if (a == "--help") {
      printf("usage: pjrt_runner --plugin P.so --module M.mlir "
             "[--input dtype:dims:file]... [--compile-options F] "
             "[--client-option k=str:v|k=int:v]... [--output prefix] "
             "[--bench N]\n"
             "--bench N: each input file holds N concatenated instances "
             "with DISTINCT contents; reports dedupe-proof two-point-slope "
             "throughput over disjoint short/long batches.\n"
             "--serve: compile once, then read one request per stdin line "
             "(whitespace-separated raw input files, one per --serve-input "
             "dtype:dims spec, in order); answers one JSON line each.\n"
             "--pipeline K: in serve mode, stage up to K requests ahead on "
             "a thread so H2D overlaps execution (replies stay ordered).\n");
      return 0;
    } else Die("unknown arg %s", a.c_str());
  }
  if (plugin.empty() || module_path.empty())
    Die("--plugin and --module are required (see --help)");
  if (serve && (bench_n > 1 || !input_specs.empty()))
    Die("--serve takes --serve-input specs, not --input/--bench");
  if (serve && serve_specs.empty())
    Die("--serve needs at least one --serve-input dtype:d0,d1,... spec");
  if (pipeline > 0 && !serve) Die("--pipeline only applies to --serve");

  std::vector<PJRT_NamedValue> create_opts;
  std::vector<std::string> opt_store;  // stable storage for strings
  opt_store.reserve(raw_opts.size() * 2);
  std::vector<int64_t> int_store;
  int_store.reserve(raw_opts.size());
  for (auto& kv : raw_opts) {
    PJRT_NamedValue nv;
    memset(&nv, 0, sizeof(nv));
    nv.struct_size = PJRT_NamedValue_STRUCT_SIZE;
    opt_store.push_back(kv.first);
    nv.name = opt_store.back().c_str();
    nv.name_size = kv.first.size();
    if (kv.second.rfind("int:", 0) == 0) {
      nv.type = PJRT_NamedValue_kInt64;
      int_store.push_back(atoll(kv.second.c_str() + 4));
      nv.int64_value = int_store.back();
      nv.value_size = 1;
    } else if (kv.second.rfind("str:", 0) == 0) {
      nv.type = PJRT_NamedValue_kString;
      opt_store.push_back(kv.second.substr(4));
      nv.string_value = opt_store.back().c_str();
      nv.value_size = opt_store.back().size();
    } else {
      Die("--client-option value must be str:... or int:... (got %s)",
          kv.second.c_str());
    }
    create_opts.push_back(nv);
  }

  void* handle = dlopen(plugin.c_str(), RTLD_NOW | RTLD_LOCAL);
  if (!handle) Die("dlopen(%s): %s", plugin.c_str(), dlerror());
  auto get_api = reinterpret_cast<const PJRT_Api* (*)()>(
      dlsym(handle, "GetPjrtApi"));
  if (!get_api) Die("GetPjrtApi not found in %s", plugin.c_str());
  g_api = get_api();
  if (!g_api) Die("GetPjrtApi returned null");

  PJRT_Plugin_Initialize_Args init_args;
  memset(&init_args, 0, sizeof(init_args));
  init_args.struct_size = PJRT_Plugin_Initialize_Args_STRUCT_SIZE;
  Check(g_api->PJRT_Plugin_Initialize(&init_args), "PJRT_Plugin_Initialize");

  PJRT_Client_Create_Args cargs;
  memset(&cargs, 0, sizeof(cargs));
  cargs.struct_size = PJRT_Client_Create_Args_STRUCT_SIZE;
  cargs.create_options = create_opts.data();
  cargs.num_options = create_opts.size();
  Check(g_api->PJRT_Client_Create(&cargs), "PJRT_Client_Create");
  PJRT_Client* client = cargs.client;

  PJRT_Client_AddressableDevices_Args dargs;
  memset(&dargs, 0, sizeof(dargs));
  dargs.struct_size = PJRT_Client_AddressableDevices_Args_STRUCT_SIZE;
  dargs.client = client;
  Check(g_api->PJRT_Client_AddressableDevices(&dargs),
        "PJRT_Client_AddressableDevices");
  if (dargs.num_addressable_devices == 0) Die("no addressable devices");
  PJRT_Device* device = dargs.addressable_devices[0];

  // Compile the StableHLO module.
  std::string module = ReadFile(module_path);
  std::string options;  // empty -> plugin defaults (1 replica, 1 partition)
  if (!options_path.empty()) options = ReadFile(options_path);
  PJRT_Program program;
  memset(&program, 0, sizeof(program));
  program.struct_size = PJRT_Program_STRUCT_SIZE;
  program.code = &module[0];
  program.code_size = module.size();
  static const char kMlir[] = "mlir";
  program.format = kMlir;
  program.format_size = sizeof(kMlir) - 1;

  PJRT_Client_Compile_Args comp;
  memset(&comp, 0, sizeof(comp));
  comp.struct_size = PJRT_Client_Compile_Args_STRUCT_SIZE;
  comp.client = client;
  comp.program = &program;
  comp.compile_options = options.data();
  comp.compile_options_size = options.size();
  Check(g_api->PJRT_Client_Compile(&comp), "PJRT_Client_Compile");
  PJRT_LoadedExecutable* exec = comp.executable;

  // Stage one host array onto the device (blocking until safe to reuse
  // the host memory).
  auto stage = [&](const InputSpec& in, const char* data) -> PJRT_Buffer* {
    PJRT_Client_BufferFromHostBuffer_Args b;
    memset(&b, 0, sizeof(b));
    b.struct_size = PJRT_Client_BufferFromHostBuffer_Args_STRUCT_SIZE;
    b.client = client;
    b.data = data;
    b.type = in.type;
    b.dims = in.dims.data();
    b.num_dims = in.dims.size();
    b.host_buffer_semantics =
        PJRT_HostBufferSemantics_kImmutableUntilTransferCompletes;
    b.device = device;
    Check(g_api->PJRT_Client_BufferFromHostBuffer(&b),
          "PJRT_Client_BufferFromHostBuffer");
    AwaitEvent(b.done_with_host_buffer, "host buffer transfer");
    return b.buffer;
  };

  // Stage inputs: args_sets[inst] is one full argument list; with --bench N
  // there are N sets with distinct contents (dedupe-proof iterations).
  // (Serve mode stages per request instead.)
  std::vector<std::vector<PJRT_Buffer*>> args_sets(bench_n);
  for (const std::string& spec : input_specs) {
    InputSpec in = ParseInput(spec, bench_n);
    for (size_t inst = 0; inst < bench_n; ++inst)
      args_sets[inst].push_back(
          stage(in, in.data.data() + inst * in.instance_bytes));
  }
  std::vector<PJRT_Buffer*>& args_bufs = args_sets[0];

  // Output count.
  PJRT_LoadedExecutable_GetExecutable_Args ge;
  memset(&ge, 0, sizeof(ge));
  ge.struct_size = PJRT_LoadedExecutable_GetExecutable_Args_STRUCT_SIZE;
  ge.loaded_executable = exec;
  Check(g_api->PJRT_LoadedExecutable_GetExecutable(&ge),
        "PJRT_LoadedExecutable_GetExecutable");
  PJRT_Executable_NumOutputs_Args no;
  memset(&no, 0, sizeof(no));
  no.struct_size = PJRT_Executable_NumOutputs_Args_STRUCT_SIZE;
  no.executable = ge.executable;
  Check(g_api->PJRT_Executable_NumOutputs(&no), "PJRT_Executable_NumOutputs");
  size_t num_outputs = no.num_outputs;

  // Execute on one device.
  PJRT_ExecuteOptions opts;
  memset(&opts, 0, sizeof(opts));
  opts.struct_size = PJRT_ExecuteOptions_STRUCT_SIZE;

  auto execute_set = [&](std::vector<PJRT_Buffer*>& set,
                         std::vector<PJRT_Buffer*>& outs) {
    outs.assign(num_outputs, nullptr);
    PJRT_Buffer** output_list = outs.data();
    PJRT_Buffer* const* arg_list = set.data();
    PJRT_Event* done = nullptr;
    PJRT_LoadedExecutable_Execute_Args ex;
    memset(&ex, 0, sizeof(ex));
    ex.struct_size = PJRT_LoadedExecutable_Execute_Args_STRUCT_SIZE;
    ex.executable = exec;
    ex.options = &opts;
    ex.argument_lists = &arg_list;
    ex.num_devices = 1;
    ex.num_args = set.size();
    ex.output_lists = &output_list;
    ex.device_complete_events = &done;
    Check(g_api->PJRT_LoadedExecutable_Execute(&ex),
          "PJRT_LoadedExecutable_Execute");
    AwaitEvent(done, "execution");
  };

  // Through a remote tunnel the completion event can resolve before the
  // device finishes (async stream) — a small host readback of output 0 is
  // the only honest synchronization (same reason bench.py reads one
  // element back).
  auto sync_readback = [&](std::vector<PJRT_Buffer*>& outs) {
    PJRT_Buffer_ToHostBuffer_Args th;
    memset(&th, 0, sizeof(th));
    th.struct_size = PJRT_Buffer_ToHostBuffer_Args_STRUCT_SIZE;
    th.src = outs[0];
    Check(g_api->PJRT_Buffer_ToHostBuffer(&th), "size query");
    std::string host(th.dst_size, '\0');
    th.dst = &host[0];
    Check(g_api->PJRT_Buffer_ToHostBuffer(&th), "sync readback");
    AwaitEvent(th.event, "sync readback");
  };

  auto destroy_outs = [&](std::vector<PJRT_Buffer*>& outs) {
    for (PJRT_Buffer* b : outs) {
      if (!b) continue;
      PJRT_Buffer_Destroy_Args d;
      memset(&d, 0, sizeof(d));
      d.struct_size = PJRT_Buffer_Destroy_Args_STRUCT_SIZE;
      d.buffer = b;
      g_api->PJRT_Buffer_Destroy(&d);
    }
  };

  // Fetch each output to host, write <prefix>.<i>, print the JSON array
  // (shared by the one-shot and serve paths).
  auto print_outputs = [&](std::vector<PJRT_Buffer*>& outs,
                           const std::string& prefix) {
    printf("[");
    for (size_t i = 0; i < num_outputs; ++i) {
      PJRT_Buffer_ToHostBuffer_Args th;
      memset(&th, 0, sizeof(th));
      th.struct_size = PJRT_Buffer_ToHostBuffer_Args_STRUCT_SIZE;
      th.src = outs[i];
      Check(g_api->PJRT_Buffer_ToHostBuffer(&th), "size query");
      std::string host(th.dst_size, '\0');
      th.dst = &host[0];
      Check(g_api->PJRT_Buffer_ToHostBuffer(&th), "PJRT_Buffer_ToHostBuffer");
      AwaitEvent(th.event, "device->host copy");

      PJRT_Buffer_Dimensions_Args bd;
      memset(&bd, 0, sizeof(bd));
      bd.struct_size = PJRT_Buffer_Dimensions_Args_STRUCT_SIZE;
      bd.buffer = outs[i];
      Check(g_api->PJRT_Buffer_Dimensions(&bd), "PJRT_Buffer_Dimensions");
      PJRT_Buffer_ElementType_Args et;
      memset(&et, 0, sizeof(et));
      et.struct_size = PJRT_Buffer_ElementType_Args_STRUCT_SIZE;
      et.buffer = outs[i];
      Check(g_api->PJRT_Buffer_ElementType(&et), "PJRT_Buffer_ElementType");

      char path[4096];
      snprintf(path, sizeof(path), "%s.%zu", prefix.c_str(), i);
      FILE* f = fopen(path, "wb");
      if (!f) Die("cannot write %s", path);
      fwrite(host.data(), 1, host.size(), f);
      fclose(f);

      printf("%s{\"file\": \"%s\", \"dtype\": \"%s\", \"shape\": [",
             i ? ", " : "", path, TypeName(et.type));
      for (size_t d = 0; d < bd.num_dims; ++d)
        printf("%s%lld", d ? ", " : "", (long long)bd.dims[d]);
      printf("], \"bytes\": %zu}", host.size());
    }
    printf("]");
  };

  if (serve) {
    std::vector<InputSpec> specs;
    for (const std::string& s : serve_specs) specs.push_back(ParseShape(s));

    struct Request {
      size_t id = 0;
      std::vector<PJRT_Buffer*> ins;
      std::string error;  // non-empty -> soft validation failure
    };

    // Parse + validate + stage one stdin line. H2D staging lives here so
    // the pipelined mode can overlap it with execution of the previous
    // request. Validation is soft (the daemon answers an error line and
    // lives on); PJRT-level failures stay fatal — a wedged client is not
    // recoverable in-process.
    auto stage_request = [&](char* line, size_t id) -> Request {
      Request req;
      req.id = id;
      std::vector<std::string> paths;
      for (char* tok = strtok(line, " \t\r\n"); tok;
           tok = strtok(nullptr, " \t\r\n"))
        paths.push_back(tok);
      char msg[512];
      if (paths.size() != specs.size()) {
        snprintf(msg, sizeof(msg), "want %zu input files, got %zu",
                 specs.size(), paths.size());
        req.error = msg;
        return req;
      }
      std::string data;
      for (size_t i = 0; i < specs.size(); ++i) {
        if (!TryReadFile(paths[i], &data)) {
          snprintf(msg, sizeof(msg), "cannot read input %zu", i);
          req.error = msg;
          return req;
        }
        if (data.size() != specs[i].instance_bytes) {
          snprintf(msg, sizeof(msg), "input %zu holds %zu bytes, spec "
                   "wants %zu", i, data.size(), specs[i].instance_bytes);
          req.error = msg;
          return req;
        }
        req.ins.push_back(stage(specs[i], data.data()));
      }
      return req;
    };

    auto serve_request = [&](Request& req) {
      if (!req.error.empty()) {
        printf("{\"request\": %zu, \"error\": \"%s\"}\n", req.id,
               req.error.c_str());
        fflush(stdout);
      } else {
        std::vector<PJRT_Buffer*> outs;
        execute_set(req.ins, outs);
        char prefix[4200];
        snprintf(prefix, sizeof(prefix), "%s.req%zu", out_prefix.c_str(),
                 req.id);
        printf("{\"request\": %zu, \"outputs\": ", req.id);
        print_outputs(outs, prefix);
        printf("}\n");
        fflush(stdout);
        destroy_outs(outs);
      }
      destroy_outs(req.ins);
    };

    auto is_blank = [](const char* line) {
      for (const char* p = line; *p; ++p)
        if (!strchr(" \t\r\n", *p)) return false;
      return true;
    };

    fprintf(stderr, "ready\n");
    fflush(stderr);
    if (pipeline == 0) {
      char* line = nullptr;
      size_t cap = 0;
      size_t req_id = 0;
      while (getline(&line, &cap, stdin) != -1) {
        if (is_blank(line)) continue;
        Request req = stage_request(line, req_id++);
        serve_request(req);
      }
      free(line);
    } else {
      // Pipelined serving: a stager thread reads + stages request N+k
      // while the main thread executes N (PJRT clients are thread-safe).
      // The bounded queue caps staged-but-unexecuted requests at
      // `pipeline` (+1 executing), bounding device memory; replies stay
      // in strict request order because the queue is FIFO and errors
      // flow through it too.
      std::deque<Request> q;
      std::mutex mu;
      std::condition_variable cv_push, cv_pop;
      bool done = false;
      std::thread stager([&] {
        char* line = nullptr;
        size_t cap = 0;
        size_t req_id = 0;
        while (getline(&line, &cap, stdin) != -1) {
          if (is_blank(line)) continue;
          Request req = stage_request(line, req_id++);
          std::unique_lock<std::mutex> lk(mu);
          cv_pop.wait(lk, [&] { return q.size() < (size_t)pipeline; });
          q.push_back(std::move(req));
          cv_push.notify_one();
        }
        free(line);
        std::lock_guard<std::mutex> lk(mu);
        done = true;
        cv_push.notify_one();
      });
      for (;;) {
        Request req;
        {
          std::unique_lock<std::mutex> lk(mu);
          cv_push.wait(lk, [&] { return !q.empty() || done; });
          if (q.empty()) break;
          req = std::move(q.front());
          q.pop_front();
          cv_pop.notify_one();
        }
        serve_request(req);
      }
      stager.join();
    }
    PJRT_Client_Destroy_Args cd;
    memset(&cd, 0, sizeof(cd));
    cd.struct_size = PJRT_Client_Destroy_Args_STRUCT_SIZE;
    cd.client = client;
    g_api->PJRT_Client_Destroy(&cd);
    return 0;
  }

  std::vector<PJRT_Buffer*> outputs;
  double sec_per_exec = -1.0, t_short = 0.0, t_long = 0.0;
  size_t n_short = 0, n_long = 0;
  if (bench_n <= 1) {
    execute_set(args_bufs, outputs);
  } else {
    // warmup (compile/layout effects) on set 0
    execute_set(args_sets[0], outputs);
    sync_readback(outputs);
    destroy_outs(outputs);
    // disjoint short/long batches of DISTINCT-content sets; the two-point
    // slope cancels the fixed sync/tunnel overhead per batch
    size_t avail = bench_n - 1;
    n_short = avail / 4 > 0 ? avail / 4 : 1;
    n_long = avail - n_short;
    if (n_long <= n_short)
      Die("internal: bench batch split degenerate (n_short=%zu n_long=%zu)",
          n_short, n_long);
    auto run_batch = [&](size_t lo, size_t hi) {
      double t0 = NowSec();
      std::vector<std::vector<PJRT_Buffer*>> outs(hi - lo);
      for (size_t i = lo; i < hi; ++i)
        execute_set(args_sets[i], outs[i - lo]);
      sync_readback(outs.back());
      double t1 = NowSec();
      for (size_t i = 0; i + 1 < outs.size(); ++i) destroy_outs(outs[i]);
      outputs = outs.back();
      return t1 - t0;
    };
    t_short = run_batch(1, 1 + n_short);
    destroy_outs(outputs);
    t_long = run_batch(1 + n_short, 1 + n_short + n_long);
    sec_per_exec = (t_long - t_short) / (double)(n_long - n_short);
  }

  // Fetch outputs.
  if (sec_per_exec > 0.0) {
    printf("{\"bench\": {\"n_short\": %zu, \"n_long\": %zu, "
           "\"t_short_s\": %.6f, \"t_long_s\": %.6f, "
           "\"sec_per_exec\": %.6f}, \"outputs\": ",
           n_short, n_long, t_short, t_long, sec_per_exec);
  } else
    printf("{\"outputs\": ");
  print_outputs(outputs, out_prefix);
  printf("}\n");

  // Teardown (best effort; process exit reclaims the rest).
  PJRT_Client_Destroy_Args cd;
  memset(&cd, 0, sizeof(cd));
  cd.struct_size = PJRT_Client_Destroy_Args_STRUCT_SIZE;
  cd.client = client;
  g_api->PJRT_Client_Destroy(&cd);
  return 0;
}
