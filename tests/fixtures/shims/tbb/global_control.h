#pragma once
namespace tbb {
struct global_control {
    enum parameter { max_allowed_parallelism, thread_stack_size };
    global_control(parameter, long) {}
};
}
