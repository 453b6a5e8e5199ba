// Native radix prefix tree for the KV cache (C ABI, loaded via ctypes).
//
// Reference counterparts: the Rust approximate radix tree in the DP router
// (sgl-router/src/tree.rs) and the Python RadixCache on the scheduler hot
// path (srt/mem_cache/radix_cache.py). This one backs the scheduler: the LPM
// admission policy walks it for EVERY waiting request EVERY tick
// (schedule_policy.py:58-71), so it is host-critical-path — the flagged
// "host-side scheduler throughput" hard part of SURVEY.md §7.3.
//
// Semantics mirror semi_pd_tpu/mem/radix_cache.py exactly (page-granular
// keys, lock refcounts, LRU leaf eviction); tests/test_radix_native.py runs
// both implementations differentially.
//
// Build: g++ -O2 -shared -fPIC -std=c++17 radix_tree.cpp -o libradixtree.so

#include <cstdint>
#include <cstring>
#include <map>
#include <memory>
#include <queue>
#include <unordered_map>
#include <vector>

namespace {

using Key = std::vector<int32_t>;

struct KeyHash {
    size_t operator()(const Key& k) const {
        size_t h = 1469598103934665603ull;
        for (int32_t v : k) {
            h ^= (size_t)(uint32_t)v;
            h *= 1099511628211ull;
        }
        return h;
    }
};

struct Node {
    uint64_t id;
    Node* parent = nullptr;
    std::vector<int32_t> key;     // tokens, length % page_size == 0
    std::vector<int32_t> pages;   // page ids, length == key.size()/page_size
    int64_t lock_ref = 0;
    uint64_t last_access = 0;
    std::unordered_map<Key, Node*, KeyHash> children;  // keyed by first page
};

struct Tree {
    int32_t page_size;
    uint64_t next_id = 1;
    uint64_t clock = 0;
    int64_t evictable_pages = 0;
    int64_t protected_pages = 0;
    Node root;
    std::unordered_map<uint64_t, std::unique_ptr<Node>> nodes;

    Node* alloc_node() {
        auto n = std::make_unique<Node>();
        n->id = next_id++;
        Node* p = n.get();
        nodes[p->id] = std::move(n);
        return p;
    }
    void free_node(Node* n) { nodes.erase(n->id); }
};

Key first_page(const int32_t* toks, int32_t P) { return Key(toks, toks + P); }

int shared_page_prefix(const std::vector<int32_t>& a, const int32_t* b,
                       size_t bn, int32_t P) {
    size_t n = std::min(a.size(), bn) / P;
    size_t match = 0;
    for (size_t i = 0; i < n; i++) {
        if (memcmp(a.data() + i * P, b + i * P, P * sizeof(int32_t)) != 0) break;
        match += P;
    }
    return (int)match;
}

Node* split_node(Tree* t, Node* node, int prefix_len) {
    int32_t P = t->page_size;
    Node* top = t->alloc_node();
    top->parent = node->parent;
    top->key.assign(node->key.begin(), node->key.begin() + prefix_len);
    top->pages.assign(node->pages.begin(), node->pages.begin() + prefix_len / P);
    top->lock_ref = node->lock_ref;
    top->last_access = node->last_access;
    top->parent->children[first_page(top->key.data(), P)] = top;

    node->key.erase(node->key.begin(), node->key.begin() + prefix_len);
    node->pages.erase(node->pages.begin(), node->pages.begin() + prefix_len / P);
    node->parent = top;
    top->children[first_page(node->key.data(), P)] = node;
    return top;
}

}  // namespace

extern "C" {

void* rtree_new(int32_t page_size) {
    Tree* t = new Tree();
    t->page_size = page_size;
    t->root.id = 0;
    t->root.lock_ref = 1;
    return t;
}

void rtree_free(void* h) { delete (Tree*)h; }

// Longest cached page-aligned prefix. Writes page ids to out_pages (cap
// out_cap), returns count; *out_node = last node id.
int64_t rtree_match(void* h, const int32_t* toks, int64_t n,
                    int32_t* out_pages, int64_t out_cap, uint64_t* out_node) {
    Tree* t = (Tree*)h;
    int32_t P = t->page_size;
    int64_t remaining = (n / P) * P;
    const int32_t* cur = toks;
    Node* node = &t->root;
    int64_t count = 0;
    while (remaining > 0) {
        auto it = node->children.find(first_page(cur, P));
        if (it == node->children.end()) break;
        Node* child = it->second;
        child->last_access = ++t->clock;
        int match = shared_page_prefix(child->key, cur, (size_t)remaining, P);
        if (match == 0) break;
        if ((size_t)match < child->key.size()) {
            child = split_node(t, child, match);
            for (int32_t p : child->pages)
                if (count < out_cap) out_pages[count++] = p;
            node = child;
            break;
        }
        for (int32_t p : child->pages)
            if (count < out_cap) out_pages[count++] = p;
        node = child;
        cur += child->key.size();
        remaining -= (int64_t)child->key.size();
    }
    *out_node = node->id;
    return count;
}

// Insert mapping; returns number of already-present pages (duplicates the
// caller should free). *out_node = final node.
int64_t rtree_insert(void* h, const int32_t* toks, int64_t n,
                     const int32_t* pages, uint64_t* out_node) {
    Tree* t = (Tree*)h;
    int32_t P = t->page_size;
    int64_t tok_left = (n / P) * P;
    const int32_t* cur = toks;
    const int32_t* cur_pages = pages;
    Node* node = &t->root;
    int64_t matched_pages = 0;
    while (tok_left > 0) {
        auto it = node->children.find(first_page(cur, P));
        if (it == node->children.end()) {
            Node* nn = t->alloc_node();
            nn->last_access = ++t->clock;  // creation counts as a touch
            nn->parent = node;
            nn->key.assign(cur, cur + tok_left);
            nn->pages.assign(cur_pages, cur_pages + tok_left / P);
            node->children[first_page(cur, P)] = nn;
            t->evictable_pages += (int64_t)nn->pages.size();
            *out_node = nn->id;
            return matched_pages;
        }
        Node* child = it->second;
        child->last_access = ++t->clock;
        int match = shared_page_prefix(child->key, cur, (size_t)tok_left, P);
        if ((size_t)match < child->key.size()) child = split_node(t, child, match);
        matched_pages += match / P;
        node = child;
        cur += match;
        cur_pages += match / P;
        tok_left -= match;
    }
    *out_node = node->id;
    return matched_pages;
}

void rtree_lock(void* h, uint64_t node_id, int32_t delta) {
    Tree* t = (Tree*)h;
    Node* node = node_id == 0 ? &t->root
                              : (t->nodes.count(node_id) ? t->nodes[node_id].get()
                                                         : nullptr);
    while (node && node != &t->root) {
        if (delta > 0 && node->lock_ref == 0) {
            t->evictable_pages -= (int64_t)node->pages.size();
            t->protected_pages += (int64_t)node->pages.size();
        }
        node->lock_ref += delta;
        if (delta < 0 && node->lock_ref == 0) {
            t->evictable_pages += (int64_t)node->pages.size();
            t->protected_pages -= (int64_t)node->pages.size();
        }
        node = node->parent;
    }
}

// LRU-evict unlocked leaves until num_pages freed; freed page ids written to
// out_pages (cap out_cap). Returns count freed.
int64_t rtree_evict(void* h, int64_t num_pages, int32_t* out_pages,
                    int64_t out_cap) {
    Tree* t = (Tree*)h;
    // collect unlocked leaves
    using Item = std::pair<uint64_t, Node*>;  // (last_access, node)
    std::priority_queue<Item, std::vector<Item>, std::greater<Item>> pq;
    std::vector<Node*> stack{&t->root};
    while (!stack.empty()) {
        Node* n = stack.back();
        stack.pop_back();
        if (n->children.empty()) {
            if (n != &t->root && n->lock_ref == 0) pq.push({n->last_access, n});
        } else {
            for (auto& kv : n->children) stack.push_back(kv.second);
        }
    }
    int64_t freed = 0;
    while (!pq.empty() && freed < num_pages) {
        Node* n = pq.top().second;
        pq.pop();
        if (n == &t->root || !n->children.empty()) continue;
        for (int32_t p : n->pages)
            if (freed < out_cap) out_pages[freed++] = p;
        t->evictable_pages -= (int64_t)n->pages.size();
        Node* parent = n->parent;
        parent->children.erase(first_page(n->key.data(), t->page_size));
        t->free_node(n);
        if (parent != &t->root && parent->children.empty() &&
            parent->lock_ref == 0)
            pq.push({parent->last_access, parent});
    }
    return freed;
}

int64_t rtree_evictable(void* h) { return ((Tree*)h)->evictable_pages; }
int64_t rtree_protected(void* h) { return ((Tree*)h)->protected_pages; }

void rtree_reset(void* h) {
    Tree* t = (Tree*)h;
    t->nodes.clear();
    t->root.children.clear();
    t->evictable_pages = 0;
    t->protected_pages = 0;
}

}  // extern "C"
